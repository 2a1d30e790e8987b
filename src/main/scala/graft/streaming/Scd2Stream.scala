package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.ChangeCapture

/** Streaming SCD2: the q155 dimension-history build maintained over a
  * change stream. The interval table lives as parquet partitioned by
  * a fixed key-hash bucket; each micro-batch rewrites ONLY the
  * buckets its keys touch — steady-state cost tracks batch volume and
  * the touched keys' history, never the table (the
  * [[StreamingUpsert]] discipline, for a sink whose unit of change is
  * a KEY'S ROW-SET rather than a single row).
  *
  * Fold per batch, equivalence by construction: a key's closed
  * intervals are immutable under in-order arrival, and its OPEN
  * interval is exactly one synthetic change event (valid_from,
  * current state) — so re-running [[ChangeCapture.scd2]] over {open
  * events of touched keys} ∪ {batch} rebuilds precisely the suffix
  * that can change, and the cumulative store equals the batch scd2
  * over every event ever folded (spec-pinned).
  *
  * Ordering contract: per key, event time must not regress ACROSS
  * batches (the watermark discipline every incremental SCD2 assumes —
  * a late event older than the open interval would need closed
  * history rewritten, which is a backfill job, not a fold). Violations
  * fail loudly rather than corrupt intervals. Within a batch any
  * order is fine.
  *
  * Replay safety: the fold is NOT naturally idempotent — a replayed
  * multi-event batch trips its own late-data guard against the state
  * it already wrote (a loud wedge, not corruption, but a wedge). The
  * streaming attach therefore runs each batch through
  * [[BatchMarkers.applyOnce]] (the [[RollupStream]] discipline): an
  * already-marked batch id is skipped, making the fold effectively
  * exactly-once under foreachBatch's at-least-once redelivery.
  */
object Scd2Stream {

  /** Fold one batch of change events into the interval store. */
  def applyBatch(spark: SparkSession, store: String, batch: DataFrame,
                 keyCol: String, tsCol: String, tieCol: String,
                 stateCols: Seq[String], nBuckets: Int = 64): Unit = {
    val ev = batch.select(
      col(keyCol) +: col(tsCol) +: col(tieCol) +: stateCols.map(col): _*)
    def kb(df: DataFrame): DataFrame =
      df.withColumn("kb", pmod(hash(col(keyCol)), lit(nBuckets)))
    val root = new Path(store)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) {
      kb(ChangeCapture.scd2(ev, keyCol, tsCol, tieCol, stateCols))
        .write.partitionBy("kb").parquet(store)
      return
    }
    val touchedKb = ev
      .select(pmod(hash(col(keyCol)), lit(nBuckets)).as("kb"))
      .distinct().collect().map(_.get(0))
    // partition-pruned: only the touched buckets are ever read
    val cur = spark.read.parquet(store)
      .where(col("kb").isin(touchedKb: _*)).drop("kb")
    val keys = ev.select(keyCol).distinct()
    val openTouched = cur.where(col("is_current"))
      .join(keys, Seq(keyCol), "left_semi")
    val late = ev
      .join(openTouched.select(col(keyCol), col("valid_from")), Seq(keyCol))
      .where(col(tsCol) < col("valid_from")).limit(1).count()
    require(late == 0,
      s"Scd2Stream: batch contains events older than a key's open" +
        s" interval — late data needs a history backfill, not a fold")
    val openAsEvents = openTouched.select(
      col(keyCol) +: col("valid_from").as(tsCol) +: col(tieCol) +:
        stateCols.map(col): _*)
    val redone = ChangeCapture.scd2(openAsEvents.unionByName(ev),
      keyCol, tsCol, tieCol, stateCols)
    val untouchedKeys = cur.join(keys, Seq(keyCol), "left_anti")
    val closedTouched = cur.where(!col("is_current"))
      .join(keys, Seq(keyCol), "left_semi")
    val next = untouchedKeys.unionByName(closedTouched).unionByName(redone)
    // localCheckpoint breaks lineage from the files the dynamic
    // overwrite below replaces (Spark rejects reading-while-writing)
    kb(next).localCheckpoint()
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("kb")
      .parquet(store)
  }

  /** Attach to a change stream; folds every micro-batch. */
  def start(stream: DataFrame, store: String, keyCol: String, tsCol: String,
            tieCol: String, stateCols: Seq[String], checkpointDir: String,
            nBuckets: Int = 64): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!b.isEmpty) {
          BatchMarkers.applyOnce(b.sparkSession, store, id) {
            applyBatch(b.sparkSession, store, b, keyCol, tsCol, tieCol,
              stateCols, nBuckets)
          }
          ()
        }
      }
      .start()
}
