package graft

import graft.ops.SegmentDedup
import graft.streaming.SegmentDedupStream
import org.apache.spark.sql.functions._

class StreamingSegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streamed segment dedup over monotone batches equals the batch op on the union") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    // plant truncated copies (+1M ids) so cross-batch dups exist:
    // batch 1 = originals, batch 2 = rest + plants (higher ids)
    val plants = docs.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        expr("concat_ws(' ', slice(split(lower(trim(text)), '\\\\s+'), 1, " +
          "greatest((size(split(lower(trim(text)), '\\\\s+')) * 4) div 5, 1)))")
          .as("text"))
    val b1 = docs.where(col("doc_id") < 250)
    val b2 = docs.where(col("doc_id") >= 250).unionAll(plants)

    val base = java.nio.file.Files.createTempDirectory("graft_segdedup").toString
    val (store, out) = (s"$base/store", s"$base/out")
    SegmentDedupStream.applyBatch(b1, "doc_id", "text", 10, store, out)
    SegmentDedupStream.applyBatch(b2, "doc_id", "text", 10, store, out)

    val streamed = spark.read.parquet(out)
      .select("doc_id", "n_segs", "n_kept", "clean_fp")
      .as[(Long, Long, Long, Option[String])].collect().sortBy(_._1).toSeq
    val batch = SegmentDedup.dedupSegments(
        b1.unionAll(b2), "doc_id", "text", segTokens = 10)
      .as[(Long, Long, Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(streamed == batch)
    // the plants actually lost segments (cross-batch dedup fired)
    assert(streamed.exists(r => r._1 >= 1000000L && r._3 < r._2))
  }

  test("sharded-bloom loop equals the batch op across an epoch rotation") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val plants = docs.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        expr("concat_ws(' ', slice(split(lower(trim(text)), '\\\\s+'), 1, " +
          "greatest((size(split(lower(trim(text)), '\\\\s+')) * 4) div 5, 1)))")
          .as("text"))
    val b1 = docs.where(col("doc_id") < 200)
    val b2 = docs.where(col("doc_id") >= 200 && col("doc_id") < 400)
    val b3 = docs.where(col("doc_id") >= 400).unionAll(plants)

    val base = java.nio.file.Files.createTempDirectory("graft_segshard").toString
    val (root, out) = (s"$base/store", s"$base/out")
    // rotateDeltaRows tiny: batch 1's fps alone exceed it, so batch 2
    // runs at epoch 2 (file-backed probe + delta join) and batch 3 at
    // epoch 3 — the equivalence below spans two rotations
    Seq(b1, b2, b3).foreach(SegmentDedupStream.applyBatchSharded(
      _, "doc_id", "text", 10, root, out, numShards = 4,
      rotateDeltaRows = 50L))

    // rotations actually happened: epoch-2 and epoch-3 families exist
    assert(new java.io.File(s"$root/bloom/epoch2/_meta").isFile)
    assert(new java.io.File(s"$root/bloom/epoch3/_meta").isFile)

    val streamed = spark.read.parquet(out)
      .select("doc_id", "n_segs", "n_kept", "clean_fp")
      .as[(Long, Long, Long, Option[String])].collect().sortBy(_._1).toSeq
    val batch = SegmentDedup.dedupSegments(
        b1.unionAll(b2).unionAll(b3), "doc_id", "text", segTokens = 10)
      .as[(Long, Long, Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(streamed == batch)
    // cross-batch dedup fired on the planted truncations
    assert(streamed.exists(r => r._1 >= 1000000L && r._3 < r._2))

    // batch 3's own rotation committed epoch4 as well
    assert(new java.io.File(s"$root/bloom/epoch4/_meta").isFile)

    // crash-recovery: an UNCOMMITTED family dir (no _meta — a rotation
    // that died mid-build) must not be selected as the serving epoch;
    // the next batch keeps serving from the committed epoch4
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/bloom/epoch5"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/bloom/epoch5/shard-00000.bloom"),
      Array[Byte](9, 9, 9))
    val extra = docs.where(col("doc_id") % 7 === 3)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    SegmentDedupStream.applyBatchSharded(extra, "doc_id", "text", 10,
      root, out, numShards = 4, rotateDeltaRows = 1000000L)
    // the replayed docs are full duplicates of already-seen segments
    val after = spark.read.parquet(out)
      .where(col("doc_id") >= 2000000L)
      .select("n_kept").as[Long].collect()
    assert(after.nonEmpty && after.forall(_ == 0L),
      "duplicate batch must be fully deduped through the committed epoch")
    Seq(2, 3, 4).foreach(e =>
      graft.ops.ShardedBloomFiles.invalidate(s"$root/bloom/epoch$e"))
  }

  test("the foreachBatch wrapper drives the same loop end-to-end") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").where(col("doc_id") < 100)
    val base = java.nio.file.Files.createTempDirectory("graft_segstream").toString
    val srcDir = s"$base/src"
    new java.io.File(srcDir).mkdirs()
    docs.where(col("doc_id") < 50).coalesce(1)
      .write.parquet(s"$srcDir/part1")
    docs.where(col("doc_id") >= 50).coalesce(1)
      .write.parquet(s"$srcDir/part2")

    val src = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val q = SegmentDedupStream.start(src, "doc_id", "text", 10,
      s"$base/store", s"$base/out", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()

    val got = spark.read.parquet(s"$base/out")
    assert(got.count() == docs.count())
    val batch = SegmentDedup.dedupSegments(docs, "doc_id", "text", 10)
    assert(got.orderBy("doc_id").collect().toSeq ==
      batch.orderBy("doc_id").collect().toSeq)
  }
}
