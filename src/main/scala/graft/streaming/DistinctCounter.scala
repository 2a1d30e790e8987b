package graft.streaming

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming distinct counting: the q117 Datasketches-HLL rollup
  * maintained over a stream. HLL sketches merge associatively and
  * idempotently (a union is a per-register max), so folding one
  * per-micro-batch sketch into a driver-side Union yields the same
  * registers as sketching the whole history in one pass — re-delivery
  * of an element is absorbed, which makes the accumulator safe under
  * at-least-once replay (unlike a linear counter).
  *
  * Each micro-batch pays one distributed `hll_sketch_agg` (fixed
  * 2^lgK-register state per partial, merged in any tree); the driver
  * holds ONE kilobyte-scale union regardless of cardinality or
  * stream length. At 100 TB the same shape shards across executors
  * and days — see q117's sketch-rollup rationale.
  */
final class StreamingDistinctCounter(colName: String, lgK: Int = 14) {
  private val acc = new Union(lgK)

  /** Fold one (micro-)batch in: one distributed sketch aggregation
    * returning a single serialized sketch to the driver.
    */
  def addBatch(batch: DataFrame): Unit = {
    val rows = batch.agg(hll_sketch_agg(col(colName), lgK).as("sk")).collect()
    val bytes = rows.headOption.map(_.getAs[Array[Byte]]("sk")).orNull
    if (bytes != null) synchronized {
      acc.update(HllSketch.heapify(bytes))
    }
  }

  /** Current distinct estimate — a consistent read under the merge
    * lock; callable between (or during) micro-batches.
    */
  def estimate: Double = synchronized { acc.getEstimate }

  /** The running union as a serialized sketch, for persistence or
    * cross-stream merging. Defensive copy under the lock.
    */
  def sketchBytes: Array[Byte] = synchronized {
    acc.getResult(TgtHllType.HLL_8).toCompactByteArray
  }

  /** Attach to a streaming frame carrying `colName`. */
  def attach(stream: DataFrame): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch((b: DataFrame, _: Long) => addBatch(b))
      .start()
}
