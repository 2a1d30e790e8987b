package graft.streaming

import graft.ops.FrequentKeys
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

  /** A consistent snapshot of the running sketch. Copied under the
    * same lock [[addBatch]] merges under: handing out the live
    * accumulator would let `estimateCount` race a concurrent
    * `mergeInPlace` and read torn counter rows.
    */
  def sketch: CountMinSketch = synchronized {
    val bytes = new java.io.ByteArrayOutputStream()
    acc.writeTo(bytes)
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes.toByteArray))
  }

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

/** Streaming heavy-hitter ENUMERATION: the Misra-Gries summary
  * ([[graft.ops.FrequentKeys]]) maintained over a stream — the
  * production path for "name the hot keys" that the Count-Min sketch
  * cannot answer. Each micro-batch pays one distributed <= k-entry
  * summarization; the driver merges it into an O(k) accumulator via
  * the mergeable-summaries merge, so after any number of batches the
  * cumulative guarantee holds with N = all rows streamed so far:
  * every key with true count > N/(k+1) is enumerated, and estimates
  * undercount by at most N/(k+1). No per-key state store, no
  * watermark (counts only grow), state independent of cardinality.
  */
final class StreamingFrequentKeys(colName: String, k: Int = 200) {
  private val acc = new FrequentKeys.MisraGries(k)

  /** A consistent snapshot (deep copy) of the running summary. */
  def summary: FrequentKeys.MisraGries = synchronized {
    new FrequentKeys.MisraGries(k).merge(acc)
  }

  def addBatch(batch: DataFrame): Unit = {
    val part = FrequentKeys.summarize(batch, colName, k)
    synchronized { acc.merge(part); () }
  }

  def attach(stream: DataFrame): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch((b: DataFrame, _: Long) => addBatch(b))
      .start()
}
