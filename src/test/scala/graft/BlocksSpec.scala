package graft

import graft.ops.Blocks
import org.apache.spark.sql.functions._

/** The r15 checkpoint-hygiene contract: a streaming fold that
  * `localCheckpoint`s frames every micro-batch must be able to free
  * their blocks deterministically once the batch commits, instead of
  * leaking storage until a driver GC (the long-lived-stream growth
  * the r14 advice flagged).
  */
class BlocksSpec extends SparkSpec {

  private def cachedRddIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("release frees an eager localCheckpoint's cached blocks") {
    val before = cachedRddIds
    val ck = spark.range(1000).select(col("id"), (col("id") * 2).as("x"))
      .localCheckpoint(true)
    assert(ck.count() === 1000L)
    val added = cachedRddIds -- before
    assert(added.nonEmpty, "an eager localCheckpoint must cache blocks")
    Blocks.release(ck)
    assert((cachedRddIds -- before).isEmpty,
      "release must unpersist the checkpointed RDD")
  }

  test("releasing a lazy frame built over a checkpoint frees the input") {
    val before = cachedRddIds
    val ck = spark.range(500).localCheckpoint(true)
    val derived = ck.groupBy((col("id") % 7).as("m")).count()
    assert(derived.count() === 7L)
    assert((cachedRddIds -- before).nonEmpty)
    // the derived frame's analyzed plan leaves on the checkpointed RDD
    Blocks.release(derived)
    assert((cachedRddIds -- before).isEmpty,
      "release must reach checkpointed leaves through a lazy plan")
  }

  test("release is a no-op on plain (non-checkpointed) frames") {
    val before = cachedRddIds
    val df = spark.range(100).select(col("id"))
    Blocks.release(df)
    assert(df.count() === 100L)
    assert(cachedRddIds === before)
  }

  test("the maxsim stream's per-batch checkpoints do not accumulate") {
    import spark.implicits._
    val mv = graft.ops.MaxSim.multiVector(
      spark.range(64).select(col("id").as("vec_id"),
        expr("transform(sequence(1, 8), d -> CAST((vec_id * 31 + d * 7) % 13 AS FLOAT) / 13.0)")
          .as("embedding")),
      "vec_id", 4)
    val root = java.nio.file.Files.createTempDirectory("blocks_idx").toString
    val out = java.nio.file.Files.createTempDirectory("blocks_out").toString +
      "/scores"
    graft.ops.MaxSim.writeIndexVersioned(mv.where(col("doc_id") >= 8), root,
      nPlanes = 4, dims = 8, dBuckets = 4)
    val before = cachedRddIds
    (0L to 2L).foreach { b =>
      graft.streaming.MaxSimStream.applyBatch(
        mv.where(col("doc_id") >= b * 2 && col("doc_id") < (b + 1) * 2),
        root, out, k = 3, nPlanes = 4, dims = 8, dBuckets = 4, batchId = b)
    }
    assert((cachedRddIds -- before).isEmpty,
      "applyBatch must release every checkpoint it takes")
  }
}
