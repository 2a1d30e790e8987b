package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Sampling

/** Streaming weighted reservoir: the q144 Efraimidis–Spirakis sampler
  * maintained over a stream — k rows per group, inclusion odds
  * proportional to weight, WITHOUT replacement. The mergeable-summary
  * family member for sampling (beside Count-Min, HLL, KLL,
  * Misra-Gries): top-k-by-priority is a bounded mergeable summary
  * because max-k of a union is max-k of per-part max-ks.
  *
  * Each micro-batch pays one distributed per-group top-k (the same
  * `Sampling.esPriority` column the batch sampler ranks by — the two
  * CANNOT rank differently), returning ≤ k·|groups| rows to a
  * driver fold that unions, dedupes by key, re-ranks, and cuts back
  * to k. Group cardinality must be operator-small (domains,
  * languages, buckets — the per-group-k contract already implies
  * that; the fold is O(k·|groups|) memory).
  *
  * At-least-once safety: priorities are content-addressed (a pure
  * function of key and weight), so a re-delivered row re-derives the
  * SAME priority and the by-key dedupe absorbs it — cumulative state
  * after any re-delivery pattern equals the batch sampler over the
  * distinct union (spec-pinned).
  */
final class WeightedReservoirStream(groupCol: String, keyCol: String,
                                    weightCol: String, k: Int) {
  require(k >= 1, s"reservoir size must be >= 1 (got $k)")

  // group -> (key -> (priority, weight)); each inner map is cut to k
  // after every fold, so state is O(k * |groups|)
  private val acc =
    mutable.Map.empty[String, mutable.Map[String, (Double, Long)]]

  /** Fold one (micro-)batch: distributed per-group top-k first, then
    * an O(k·|groups|) driver merge.
    */
  def addBatch(batch: DataFrame): Unit = {
    // null group keys are excluded (the driver fold keys state by the
    // group's string form; a null group has no meaningful reservoir)
    val top = Sampling
      .weightedSamplePerGroupWithPriority(
        batch.where(col(groupCol).isNotNull), groupCol, keyCol, weightCol, k)
      .select(col(groupCol).cast("string").as("g"),
        col(keyCol).cast("string").as("key"), col("_es"),
        col(weightCol).cast("long").as("w"))
      .collect()
    synchronized {
      top.foreach { r =>
        val m = acc.getOrElseUpdate(r.getString(0), mutable.Map.empty)
        m.update(r.getString(1), (r.getDouble(2), r.getLong(3)))
      }
      acc.foreach { case (_, m) =>
        if (m.size > k) {
          val keep = m.toSeq.sortBy { case (key, (es, _)) => (-es, key) }
            .take(k).map(_._1).toSet
          m.filterInPlace { case (key, _) => keep.contains(key) }
        }
      }
    }
  }

  /** Current reservoir: (group, rnk, key, weight), ranked exactly as
    * the batch sampler ranks (priority desc, key asc).
    */
  def sample(): Seq[(String, Long, String, Long)] = synchronized {
    acc.toSeq.flatMap { case (g, m) =>
      m.toSeq.sortBy { case (key, (es, _)) => (-es, key) }
        .zipWithIndex
        .map { case ((key, (_, w)), i) => (g, (i + 1).toLong, key, w) }
    }.sortBy(r => (r._1, r._2))
  }

  /** Attach to a streaming frame carrying the three columns. */
  def attach(stream: DataFrame): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch((b: DataFrame, _: Long) => addBatch(b))
      .start()
}
