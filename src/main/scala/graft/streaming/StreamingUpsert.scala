package graft.streaming

import graft.sources.Merge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC apply: a stream of keyed updates continuously merged
  * into a hive-partitioned parquet table. Each micro-batch is applied
  * with [[graft.sources.Merge.upsertPartitioned]] — a partition-scoped
  * rewrite that reads and rewrites ONLY the partitions the batch
  * touches, so steady-state cost tracks update volume, not table
  * size. This is the streaming half of the incremental-load loop
  * whose batch half is [[graft.ops.ChangeCapture.snapshotDiff]]
  * (diff → stream of changes → merged target), and the incremental
  * replacement for the reference's full-reload HistoryLoad.
  *
  * Exactly-once: the sink is idempotent per key (an upsert reapplied
  * yields the same table), and the checkpoint prevents batch replay
  * after clean restarts — the standard foreachBatch contract.
  */
object StreamingUpsert {

  /** Start applying `updates` (a streaming DataFrame containing key,
    * payload, and partition columns) to the table at `targetPath`.
    */
  def start(updates: DataFrame, targetPath: String, keyCols: Seq[String],
            partitionCol: String, checkpointDir: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          Merge.upsertPartitioned(batch.sparkSession, targetPath, batch,
            keyCols, partitionCol)
          ()
        }
      }
      .start()
}
