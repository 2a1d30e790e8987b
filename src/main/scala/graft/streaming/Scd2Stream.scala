package graft.streaming

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
  * Ordering contract: per key, event time should not regress ACROSS
  * batches (the watermark discipline every incremental SCD2 assumes —
  * a late event older than the open interval would need closed
  * history rewritten, which is a backfill job, not a fold). Real CDC
  * feeds still deliver the occasional late row, and a wedged stream
  * is the wrong answer to one: violating rows are QUARANTINED to a
  * dead-letter parquet at `<store>/_latedata` (tagged with the
  * micro-batch id that carried them), the fold proceeds with the
  * on-time rows, and the stream stays alive. The `_`-prefixed dir is
  * invisible to readers of the store itself; drain it with a periodic
  * backfill job (recompute the affected keys' history from the full
  * event log) — [[ChangeCapture.scd2]] IS that job. Within a batch
  * any order is fine.
  *
  * Replay safety: the fold is NOT naturally idempotent — a replayed
  * multi-event batch would misfold against the state it already wrote
  * (its own rows now read as late and quarantine as spurious
  * dead-letter rows). The streaming attach therefore runs EVERY
  * identified batch — including empty ones — through
  * [[BatchMarkers.applyOnce]] (the [[RollupStream]] discipline): an
  * already-marked batch id is skipped, making the fold effectively
  * exactly-once under foreachBatch's at-least-once redelivery.
  */
object Scd2Stream {

  /** Fold one batch of change events into the interval store. Rows
    * older than their key's open interval are appended to
    * `<store>/_latedata` with `batch_id = batchId` instead of folded.
    */
  def applyBatch(spark: SparkSession, store: String, batch: DataFrame,
                 keyCol: String, tsCol: String, tieCol: String,
                 stateCols: Seq[String], nBuckets: Int = 64,
                 batchId: Long = -1L): Unit = {
    val ev = batch.select(
      col(keyCol) +: col(tsCol) +: col(tieCol) +: stateCols.map(col): _*)
    def kb(df: DataFrame): DataFrame =
      df.withColumn("kb", pmod(hash(col(keyCol)), lit(nBuckets)))
    // data probe, not bare exists: the dir may already hold only the
    // _applied markers of empty batches (or _temporary debris from a
    // crashed first write) — states a bare exists would send into a
    // doomed read. Append for the same reason: the dir may exist.
    if (!BatchMarkers.hasData(spark, store)) {
      kb(ChangeCapture.scd2(ev, keyCol, tsCol, tieCol, stateCols))
        .write.mode("append").partitionBy("kb").parquet(store)
      return
    }
    val touchedKb = ev
      .select(pmod(hash(col(keyCol)), lit(nBuckets)).as("kb"))
      .distinct().collect().map(_.get(0))
    // partition-pruned: only the touched buckets are ever read
    val cur = spark.read.parquet(store)
      .where(col("kb").isin(touchedKb: _*)).drop("kb")
    // late-row split: a row older than its key's OPEN interval cannot
    // fold (closed history would need rewriting); it dead-letters.
    // Keys with no open interval (never seen) are on-time by
    // definition. persist: `tagged` feeds both halves of the split.
    val evKeys = ev.select(keyCol).distinct()
    val openAll = cur.where(col("is_current"))
      .join(evKeys, Seq(keyCol), "left_semi")
    val tagged = ev.join(
      openAll.select(col(keyCol), col("valid_from").as("__open_from")),
      Seq(keyCol), "left").persist()
    try {
      val lateRows = tagged
        .where(col("__open_from").isNotNull && col(tsCol) < col("__open_from"))
        .drop("__open_from")
      if (!lateRows.isEmpty)
        lateRows.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(s"$store/_latedata")
      val onTime = tagged
        .where(col("__open_from").isNull || col(tsCol) >= col("__open_from"))
        .drop("__open_from")
      if (onTime.isEmpty) return
      // the fold sees only on-time keys: a key whose rows ALL
      // quarantined is untouched and its history must carry through
      val keys = onTime.select(keyCol).distinct()
      val openTouched = cur.where(col("is_current"))
        .join(keys, Seq(keyCol), "left_semi")
      val openAsEvents = openTouched.select(
        col(keyCol) +: col("valid_from").as(tsCol) +: col(tieCol) +:
          stateCols.map(col): _*)
      val redone = ChangeCapture.scd2(openAsEvents.unionByName(onTime),
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
    } finally { tagged.unpersist(); () }
  }

  /** Attach to a change stream; folds every micro-batch. Every
    * delivered batch id is marked — the empty check sits INSIDE the
    * marker fold ([[BatchMarkers]] marking discipline).
    */
  def start(stream: DataFrame, store: String, keyCol: String, tsCol: String,
            tieCol: String, stateCols: Seq[String], checkpointDir: String,
            nBuckets: Int = 64): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        BatchMarkers.applyOnce(b.sparkSession, store, id) {
          if (!b.isEmpty)
            applyBatch(b.sparkSession, store, b, keyCol, tsCol, tieCol,
              stateCols, nBuckets, id)
        }
        ()
      }
      .start()
}
