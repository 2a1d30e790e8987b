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
  * is the wrong answer to one: rows older than their key's high
  * watermark (max folded event time, an `hwm` column the store
  * carries — see [[applyBatch]] for why `valid_from` is NOT a safe
  * guard) are QUARANTINED to a dead-letter parquet at
  * `<store>/_latedata` (tagged with the micro-batch id that carried
  * them), the fold proceeds with the on-time rows, and the stream
  * stays alive. The `_`-prefixed dir is
  * invisible to readers of the store itself; drain it with
  * [[backfillQuarantine]] on a maintenance cadence (recomputes the
  * affected keys' history from the full event log and swaps exactly
  * their buckets — oracle-gated by q194). Within a batch any order
  * is fine.
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
    * older than their key's HIGH WATERMARK — the max (event time,
    * tie) pair the key has ever folded, carried as `hwm`/`hwm_tie`
    * columns on the store — are appended to `<store>/_latedata` with
    * `batch_id = batchId` instead of folded.
    *
    * The watermark PAIR, not the open interval's `valid_from`, is the
    * guard, for two reasons. (1) [[ChangeCapture.scd2]] collapses an
    * event that re-asserts the current state into the open interval,
    * so `valid_from` can be OLDER than events the store has already
    * seen — a row younger than `valid_from` but older than a
    * collapsed re-assertion would pass a `valid_from` guard and
    * silently misfold (the q194 gate caught exactly this: 3 intervals
    * lost on the real slice). (2) A timestamp alone has the same hole
    * one level down: a row whose ts EQUALS the watermark but whose
    * tie sorts BEFORE the watermark event regresses in (ts, tie)
    * order — the order scd2 folds by — so the guard compares the
    * lexicographic pair. Quarantined rows do not advance the
    * watermark; the backfill recomputes it from the log.
    *
    * The dead-letter append happens AFTER the fold commits (late rows
    * snapshot via localCheckpoint first): a fold that fails leaves no
    * dead-letter residue to double on retry. A crash INSIDE the
    * fold-vs-marker rename window can still replay the batch against
    * its own folded state, re-classifying already-folded rows as late
    * — spurious dead-letter rows, which [[backfillQuarantine]] drains
    * harmlessly because it recomputes from the LOG and only reads
    * quarantined KEYS, never quarantined contents. `_latedata` counts
    * are advisory, not exactly-once.
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
      kb(ChangeCapture.scd2(ev, keyCol, tsCol, tieCol, stateCols)
          .join(hwmOf(ev, keyCol, tsCol, tieCol), Seq(keyCol)))
        .write.mode("append").partitionBy("kb").parquet(store)
      return
    }
    val touchedKb = ev
      .select(pmod(hash(col(keyCol)), lit(nBuckets)).as("kb"))
      .distinct().collect().map(_.get(0))
    // partition-pruned: only the touched buckets are ever read. kb is
    // kept so the WRITE set below can narrow further — to buckets
    // holding at least one on-time key (an all-late batch segment
    // must not rewrite its buckets byte-identically)
    val curAll = spark.read.parquet(store)
      .where(col("kb").isin(touchedKb: _*))
    // late-row split against the watermark pair (read off the key's
    // open row). Keys with no open interval (never seen) are on-time
    // by definition. localCheckpoint: the split feeds writes that
    // replace the very files this plan reads.
    val evKeys = ev.select(keyCol).distinct()
    val openAll = curAll.where(col("is_current"))
      .join(evKeys, Seq(keyCol), "left_semi")
    val tagged = ev.join(
      openAll.select(col(keyCol), col("hwm").as("__hwm"),
        col("hwm_tie").as("__hwmt")),
      Seq(keyCol), "left").localCheckpoint(true)
    val regressed = struct(col(tsCol).as("h"), col(tieCol).as("t")) <
      struct(col("__hwm").as("h"), col("__hwmt").as("t"))
    val lateRows = tagged
      .where(col("__hwm").isNotNull && regressed)
      .drop("__hwm", "__hwmt")
    val onTime = tagged
      .where(col("__hwm").isNull || !regressed)
      .drop("__hwm", "__hwmt")
    if (!onTime.isEmpty) {
      // the fold sees only on-time keys: a key whose rows ALL
      // quarantined is untouched and its history must carry through
      val keys = onTime.select(keyCol).distinct()
      // bounded driver read #2: the write-set buckets (<= nBuckets)
      val onTimeKb = keys
        .select(pmod(hash(col(keyCol)), lit(nBuckets)).as("kb"))
        .distinct().collect().map(_.get(0))
      val cur = curAll.where(col("kb").isin(onTimeKb: _*)).drop("kb")
      val openTouched = cur.where(col("is_current"))
        .join(keys, Seq(keyCol), "left_semi")
      val openAsEvents = openTouched.select(
        col(keyCol) +: col("valid_from").as(tsCol) +: col(tieCol) +:
          stateCols.map(col): _*)
      val redone0 = ChangeCapture.scd2(openAsEvents.unionByName(onTime),
        keyCol, tsCol, tieCol, stateCols)
      // watermark advance: lexicographic max(old pair, batch pair)
      // per on-time key — attached to every redone row, read back
      // off the open row
      val newHwm = hwmOf(onTime, keyCol, tsCol, tieCol)
        .withColumnRenamed("hwm", "__bh").withColumnRenamed("hwm_tie", "__bt")
        .join(openTouched.select(col(keyCol), col("hwm"), col("hwm_tie")),
          Seq(keyCol), "left")
        .select(col(keyCol),
          greatest(
            coalesce(struct(col("hwm").as("h"), col("hwm_tie").as("t")),
              struct(col("__bh").as("h"), col("__bt").as("t"))),
            struct(col("__bh").as("h"), col("__bt").as("t"))).as("__p"))
        .select(col(keyCol), col("__p.h").as("hwm"),
          col("__p.t").as("hwm_tie"))
      val redone = redone0.join(newHwm, Seq(keyCol))
      val untouchedKeys = cur.join(keys, Seq(keyCol), "left_anti")
      // closed rows carry their pre-batch hwm — stale but unread (the
      // watermark is only ever read off the is_current row)
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
    // dead-letter AFTER the fold committed (see scaladoc); lateRows is
    // checkpointed above, immune to the overwrite
    if (!lateRows.isEmpty)
      lateRows.withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(s"$store/_latedata")
  }

  /** Per-key lexicographic max (ts, tie) of an event frame, as
    * `(key, hwm, hwm_tie)` — the watermark the store carries.
    */
  private def hwmOf(ev: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String): DataFrame =
    ev.groupBy(keyCol)
      .agg(max(struct(col(tsCol), col(tieCol))).as("__p"))
      .select(col(keyCol), col("__p")(tsCol).as("hwm"),
        col("__p")(tieCol).as("hwm_tie"))

  /** Drain the `_latedata` quarantine: recompute the affected keys'
    * history from the FULL event log and swap exactly their buckets.
    * This is the backfill job the quarantine scaladoc prescribes —
    * and it must take the LOG, not reconstruct events from the
    * store's own intervals: a late row's absence can make two
    * adjacent on-time events share a state, and [[ChangeCapture
    * .scd2]]'s collapse then drops the re-assertion event from the
    * store — recoverable only from the source log. With the log in
    * hand the fold is trivially exact: the affected keys' history
    * IS `scd2(log)` by definition.
    *
    * Cost at 100 TB: one semi-join-filtered log scan per backfill
    * tick (amortize by draining on a cadence, not per late row) plus
    * a dynamic overwrite of ONLY the quarantined keys' buckets —
    * untouched buckets are never read or written. Returns the number
    * of late rows drained (0 = no quarantine, nothing touched).
    *
    * Crash-safe by idempotence: a crash between the bucket overwrite
    * and the quarantine delete re-runs the same log recompute (same
    * result) and deletes then. Single maintainer at a time — the
    * [[graft.ops.Generations]] cadence-owner contract.
    */
  def backfillQuarantine(spark: SparkSession, store: String, log: DataFrame,
                         keyCol: String, tsCol: String, tieCol: String,
                         stateCols: Seq[String], nBuckets: Int = 64): Long = {
    val latePath = s"$store/_latedata"
    if (!BatchMarkers.hasData(spark, latePath)) return 0L
    // snapshot keys + count before anything mutates: the bucket
    // overwrite and the quarantine delete both invalidate lazy plans
    // over the files they replace
    val late = spark.read.parquet(latePath).localCheckpoint(true)
    val nLate = late.count()
    val keys = late.select(keyCol).distinct()
    def kb(df: DataFrame): DataFrame =
      df.withColumn("kb", pmod(hash(col(keyCol)), lit(nBuckets)))
    // bounded driver read: <= nBuckets values
    val touchedKb = keys
      .select(pmod(hash(col(keyCol)), lit(nBuckets)).as("kb"))
      .distinct().collect().map(_.get(0))
    val cur = spark.read.parquet(store)
      .where(col("kb").isin(touchedKb: _*)).drop("kb")
    val events = log.join(keys, Seq(keyCol), "left_semi").select(
      col(keyCol) +: col(tsCol) +: col(tieCol) +: stateCols.map(col): _*)
    // watermark recomputed from the log (the late rows fold in here)
    val redone = ChangeCapture.scd2(events, keyCol, tsCol, tieCol, stateCols)
      .join(hwmOf(events, keyCol, tsCol, tieCol), Seq(keyCol))
    val untouched = cur.join(keys, Seq(keyCol), "left_anti")
    kb(untouched.unionByName(redone)).localCheckpoint()
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("kb")
      .parquet(store)
    val p = new org.apache.hadoop.fs.Path(latePath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    nLate
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
