package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.util.sketch.CountMinSketch

/** Streaming heavy hitters: the q112 Count-Min sketch maintained over
  * a stream. The sketch is LINEARLY mergeable — counters add — so a
  * per-micro-batch sketch merged into an accumulator equals the
  * single-pass batch sketch over the same rows EXACTLY (same
  * eps/confidence/seed => same hash functions; spec-asserted
  * equality, not approximate agreement). That linearity is the whole
  * streaming story: each micro-batch pays one distributed
  * fixed-size-state aggregation, the driver holds one ~KB-to-MB
  * sketch regardless of key cardinality or stream length, and the
  * running estimate is queryable between batches.
  *
  * At 100 TB/day the same shape shards: partial sketches merge
  * associatively in any tree, so N executors (or N independent
  * streams) each maintain one and a reducer folds them — no per-key
  * state store, no watermark needed (counts only grow).
  */
final class StreamingHeavyHitters(colName: String, eps: Double = 0.0005,
                                  confidence: Double = 0.99,
                                  seed: Int = 42) {
  private val acc = CountMinSketch.create(eps, confidence, seed)

  /** The running sketch (mutated in place as batches arrive). */
  def sketch: CountMinSketch = acc

  /** Fold one (micro-)batch in: one distributed sketch aggregation,
    * one driver-side merge of two fixed-size arrays.
    */
  def addBatch(batch: DataFrame): Unit = synchronized {
    acc.mergeInPlace(batch.stat.countMinSketch(colName, eps, confidence, seed))
    ()
  }

  /** Attach to a streaming frame carrying `colName`. */
  def attach(stream: DataFrame): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch((b: DataFrame, _: Long) => addBatch(b))
      .start()
}
