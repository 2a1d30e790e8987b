package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed single-pass moments aggregator (`Aggregator[IN, BUF, OUT]`
  * — the engine's sanctioned custom-aggregate API, SURVEY.md §2.2
  * "UDF/UDAF" row).
  *
  * Accumulates (n, Σx, Σx²) in cent-scaled longs, so the merge is
  * exact and commutative — the same order-independence contract the
  * oracle queries get from DECIMAL sums — and converts to double
  * variance only in `finish`. Buffers are primitive longs: the
  * aggregation stays a tight object-agg with trivially serializable
  * state.
  */
object MomentsAggregator {

  case class Moments(n: Long, sumCents: Long, sumSqCents2: Long)
  case class MomentsOut(n: Long, mean: Double, variance: Double)

  /** Aggregates cent-precise doubles extracted from `IN` (e.g. prices,
    * quantities with <= 2 decimals).
    */
  def centMomentsOf[IN](extract: IN => Double): Aggregator[IN, Moments, MomentsOut] =
    new Aggregator[IN, Moments, MomentsOut] {
      override def zero: Moments = Moments(0L, 0L, 0L)
      override def reduce(b: Moments, row: IN): Moments = {
        val c = math.round(extract(row) * 100)
        Moments(b.n + 1, b.sumCents + c, b.sumSqCents2 + c * c)
      }
      override def merge(a: Moments, b: Moments): Moments =
        Moments(a.n + b.n, a.sumCents + b.sumCents,
          a.sumSqCents2 + b.sumSqCents2)
      override def finish(m: Moments): MomentsOut = {
        if (m.n < 2) MomentsOut(m.n, if (m.n == 0) 0.0 else m.sumCents / 100.0, 0.0)
        else {
          val s1 = m.sumCents / 100.0
          val s2 = m.sumSqCents2 / 10000.0
          MomentsOut(m.n, s1 / m.n, (s2 - s1 * s1 / m.n) / (m.n - 1))
        }
      }
      override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
      override def outputEncoder: Encoder[MomentsOut] = Encoders.product[MomentsOut]
    }

  /** The plain-double instance. */
  val centMoments: Aggregator[Double, Moments, MomentsOut] =
    centMomentsOf[Double](identity)
}
