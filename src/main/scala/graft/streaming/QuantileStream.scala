package graft.streaming

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming quantiles: the q119 KLL sketch maintained over a stream
  * — the quantile member of the mergeable-summary streaming family
  * (Count-Min `StreamingHeavyHitters`, HLL `StreamingDistinctCounter`,
  * Misra-Gries `StreamingFrequentKeys`).
  *
  * Each micro-batch pays one distributed `Kll.sketchAgg` (O(k log n)
  * state per partial, merged in any tree) returning a single
  * kilobyte-scale sketch to the driver, which folds it into an O(k
  * log n) accumulator. Quantile estimates are queryable between
  * batches at the sketch's ~1.65% (k=200) normalized rank error —
  * unlike the HLL union, re-delivered rows DO re-count (rank sketches
  * are weight-linear), so feed this from an exactly-once source or an
  * upstream dedup stage.
  */
final class StreamingQuantiles(colName: String, k: Int = 200) {
  private val acc = KllDoublesSketch.newHeapInstance(k)

  /** Fold one (micro-)batch in. */
  def addBatch(batch: DataFrame): Unit = {
    val rows = batch.agg(
      graft.functions.Kll.sketchAgg(col(colName), k).as("sk")).collect()
    val bytes = rows.headOption.map(_.getAs[Array[Byte]]("sk")).orNull
    if (bytes != null) synchronized {
      acc.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    }
  }

  /** Current quantile estimate at `rank` in [0,1]; NaN before any data. */
  def quantile(rank: Double): Double = synchronized {
    if (acc.isEmpty) Double.NaN else acc.getQuantile(rank)
  }

  def count: Long = synchronized { acc.getN }

  /** Serialized accumulator for persistence or cross-stream rollup. */
  def sketchBytes: Array[Byte] = synchronized { acc.toByteArray }

  /** Attach to a streaming frame carrying `colName`. */
  def attach(stream: DataFrame): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch((b: DataFrame, _: Long) => addBatch(b))
      .start()
}
