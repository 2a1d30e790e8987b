package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted LSH bucket index: the near-dup complement of
  * [[IncrementalDedup]]'s exact fingerprint store for steady-state
  * ingest. The corpus's MinHash band keys are materialized ONCE as a
  * parquet table; each arriving batch computes only its own
  * signatures (narrow, O(batch)), probes the index for bucket
  * collisions, and appends its keys — the corpus is never re-shingled
  * and never re-shuffled to answer "is this new document a near-dup
  * of anything we already have?".
  *
  * Layout: (id, bandsig) hive-partitioned by `band` — a handful of
  * directories, each holding fixed-width keys; per-batch probes read
  * the index via a join keyed on (band, bandsig) with the SMALL batch
  * side broadcast, so index-side data never moves across the network.
  * Degenerate buckets (boilerplate signatures shared by thousands of
  * docs) are dropped at BUILD time by `maxBucketSize`, mirroring
  * [[Dedup.lshCandidatePairs]]'s cap: they would flag every future
  * batch against the same junk cluster.
  *
  * Reference analogue: none — the reference recomputes from scratch
  * per run (`main.py` full-reload loop); this is the incremental form
  * that makes near-dup affordable as a per-ingest step at 100 TB.
  */
object LshIndex {

  /** Build (overwrite) the index from a signature frame
    * (id, h0..h{k-1} as produced by the MinHash family).
    */
  def write(sig: DataFrame, idCol: String, bands: Int, rowsPerBand: Int,
            path: String, maxBucketSize: Int = 1000): Unit = {
    val keys = Dedup.bandKeys(sig, idCol, bands, rowsPerBand)
    val w = Window.partitionBy("band", "bandsig")
    keys.withColumn("_n", count(lit(1)).over(w))
      .where(col("_n") <= maxBucketSize)
      .drop("_n")
      .write.mode("overwrite").partitionBy("band").parquet(path)
  }

  /** Candidate (batch doc, corpus doc) near-dup pairs: batch band
    * keys joined against the index. The batch side broadcasts; the
    * index is scanned in place.
    */
  def probe(spark: SparkSession, path: String, batchSig: DataFrame,
            idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val idx = spark.read.parquet(path)
    val probeKeys = Dedup.bandKeys(batchSig, idCol, bands, rowsPerBand)
      .withColumnRenamed(idCol, "batch_id")
    idx.join(broadcast(probeKeys), Seq("band", "bandsig"))
      .where(col(idCol) =!= col("batch_id"))
      .select(col("batch_id"), col(idCol).as("corpus_id"))
      .distinct()
  }

  /** Append a batch's band keys (call after [[probe]] has accepted
    * the batch — typically only for the docs that were NOT flagged,
    * so the index stays a clean-corpus index). Appends do NOT
    * re-apply the bucket cap — boilerplate arriving over many batches
    * can regrow degenerate buckets; run [[compact]] periodically
    * (alongside file compaction) to re-enforce it.
    */
  def append(batchSig: DataFrame, idCol: String, bands: Int,
             rowsPerBand: Int, path: String): Unit =
    Dedup.bandKeys(batchSig, idCol, bands, rowsPerBand)
      .write.mode("append").partitionBy("band").parquet(path)

  /** Re-enforce the bucket cap over the whole index (drop buckets
    * that grew past `maxBucketSize` through appends) and rewrite it.
    * One shuffle of the index keys; run at maintenance cadence, like
    * [[graft.sources.PartitionedSink.compact]].
    */
  def compact(spark: SparkSession, path: String,
              maxBucketSize: Int = 1000): Unit = {
    val w = Window.partitionBy("band", "bandsig")
    val kept = spark.read.parquet(path)
      .withColumn("_n", count(lit(1)).over(w))
      .where(col("_n") <= maxBucketSize)
      .drop("_n")
      .localCheckpoint(true) // snapshot before overwriting the source
    kept.write.mode("overwrite").partitionBy("band").parquet(path)
  }

  /** [[write]] into the next generation under a [[Generations]] root,
    * then flip `CURRENT` atomically. Probe/append against
    * `Generations.livePath(spark, root)`.
    */
  def writeVersioned(sig: DataFrame, idCol: String, bands: Int,
                     rowsPerBand: Int, root: String,
                     maxBucketSize: Int = 1000): String = {
    val spark = sig.sparkSession
    val next = Generations.nextPath(spark, root)
    write(sig, idCol, bands, rowsPerBand, next, maxBucketSize)
    Generations.publish(spark, root, next)
    next
  }

  /** [[compact]] against a generation root: the re-capped index lands
    * in a NEW generation (no localCheckpoint snapshot needed — the
    * source generation is never overwritten) and becomes visible via
    * one pointer flip, so an in-place overwrite can no longer lose
    * the index on a crash or serve a half-written one to concurrent
    * probes. Returns the new live generation.
    */
  def compactVersioned(spark: SparkSession, root: String,
                       maxBucketSize: Int = 1000, keep: Int = 2): String = {
    val live = Generations.livePath(spark, root)
    val w = Window.partitionBy("band", "bandsig")
    val next = Generations.nextPath(spark, root)
    spark.read.parquet(live)
      .withColumn("_n", count(lit(1)).over(w))
      .where(col("_n") <= maxBucketSize)
      .drop("_n")
      .write.mode("overwrite").partitionBy("band").parquet(next)
    Generations.publish(spark, root, next)
    Generations.prune(spark, root, keep)
    next
  }
}
