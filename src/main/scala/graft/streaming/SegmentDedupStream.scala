package graft.streaming

import graft.ops.SegmentDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming sub-document dedup: a continuous document stream cleaned
  * against ALL segments ever seen, not just the current micro-batch.
  *
  * The cross-batch memory is a parquet segment-fingerprint store, not
  * operator state: stream state lives in executor memory/RocksDB and
  * is sized for keys-in-a-watermark-window, while a corpus segment set
  * at 100 TB is itself terabytes — it belongs in the table tier.
  * Each micro-batch:
  *
  *   1. splits its documents into segments (narrow),
  *   2. keeps first occurrence within the batch (one window),
  *   3. anti-joins the store on segment fingerprint (drops everything
  *      any earlier batch kept),
  *   4. appends the surviving docs' stats to `outPath` and the
  *      surviving fingerprints to the store.
  *
  * With arrival order consistent with `idCol` order (monotone ingest
  * ids — the natural case for a crawl), the cumulative output equals
  * the batch [[SegmentDedup.dedupSegments]] over everything ingested:
  * verified by `StreamingSegmentDedupSpec`. The store read/write is
  * snapshot-isolated per batch via `localCheckpoint` (same pattern as
  * [[graft.sources.Merge.upsertPartitioned]]) so the append never
  * feeds back into its own batch's anti-join lineage.
  *
  * Store growth is one 32-byte fingerprint row per NEW segment —
  * at most the clean-corpus token volume / segTokens; compact it
  * periodically with [[graft.sources.PartitionedSink.compact]].
  */
object SegmentDedupStream {

  def start(docs: DataFrame, idCol: String, textCol: String, segTokens: Int,
            storePath: String, outPath: String,
            checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          applyBatch(batch, idCol, textCol, segTokens, storePath, outPath)
      }
      .start()

  /** One micro-batch of the loop; also the unit the spec replays. */
  def applyBatch(batch: DataFrame, idCol: String, textCol: String,
                 segTokens: Int, storePath: String, outPath: String): Unit = {
    val spark = batch.sparkSession
    val segs = SegmentDedup.segments(batch, idCol, textCol, segTokens)

    val w = Window.partitionBy("seg").orderBy(col(idCol), col("seg_idx"))
    val inBatch = segs
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .withColumn("seg_fp", md5(col("seg")))

    val seen: DataFrame =
      try spark.read.parquet(storePath).select("seg_fp")
      catch { case _: org.apache.spark.sql.AnalysisException =>
        spark.emptyDataFrame.select(lit("").as("seg_fp")).where(lit(false))
      }

    // snapshot the survivors BEFORE touching the store: the store
    // append below must not invalidate this plan's source
    val kept = inBatch.join(seen, Seq("seg_fp"), "left_anti")
      .localCheckpoint(true)

    SegmentDedup.reassemble(segs, kept, idCol)
      .write.mode("append").parquet(outPath)
    kept.select("seg_fp").write.mode("append").parquet(storePath)
  }
}
