package graft.streaming

import graft.ops.Expectations
import graft.ops.Expectations.{RowCount, Rule, Unique}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming data-quality monitor: the q132 constraint suite
  * maintained over a stream. Violation counts are LINEAR — each
  * micro-batch pays the same single aggregation pass the batch
  * evaluator uses (minus [[RowCount]], whose verdict is a property of
  * the total and is re-derived from the cumulative count at report
  * time) and the driver folds one row of longs per batch, O(rules)
  * state regardless of stream length. `report()` then applies the
  * IDENTICAL verdict math as `Expectations.evaluate`, so cumulative
  * stream verdicts equal the batch suite over the concatenated input
  * exactly (spec-pinned).
  *
  * [[Unique]] rules are REJECTED here: cross-batch uniqueness is not
  * a mergeable count — it needs the set of seen keys, which is the
  * incremental-dedup problem, solved at scale by
  * [[graft.ops.IncrementalDedup]]'s bloom-routed anti-join (route
  * duplicates there; gate on its quarantine counts instead).
  *
  * Linear fold ⇒ exactly-once delivery assumed (the
  * [[QuantileStream]] contract, not the sketch twins' idempotent
  * one): a replayed batch double-counts violations AND rows, so
  * fractions stay honest but absolute counts drift.
  */
final class StreamingExpectations(rules: Seq[Rule]) {
  require(rules.nonEmpty, "at least one rule")
  require(!rules.exists(_.isInstanceOf[Unique]),
    "Unique is not streamable (cross-batch uniqueness is not a mergeable" +
      " count) — use IncrementalDedup for the cross-batch key path")

  /** A verdict row, same fields as the batch evaluator's output. */
  final case class Verdict(rule: String, colName: String,
                           nViolations: Long, metricMilli: Long,
                           thresholdMilli: Long, pass: Boolean)

  private val perBatch = rules.filter(!_.isInstanceOf[RowCount])
  private var n = 0L
  private val viol = scala.collection.mutable.Map.empty[Rule, Long]
    .withDefaultValue(0L)

  /** Fold one (micro-)batch in: ONE aggregation, one row of longs to
    * the driver.
    */
  def addBatch(batch: DataFrame): Unit = {
    val aggs = count(lit(1)).cast("long").as("n__") +:
      perBatch.zipWithIndex.map { case (r, i) =>
        Expectations.violationAgg(r).cast("long").as(s"v__$i")
      }
    val row = batch.agg(aggs.head, aggs.tail: _*).collect()(0)
    synchronized {
      n += row.getLong(0)
      perBatch.zipWithIndex.foreach { case (r, i) =>
        viol(r) += row.getLong(i + 1)
      }
    }
  }

  /** Cumulative verdicts — the same math as the batch evaluator over
    * everything folded so far. Consistent snapshot under the lock.
    */
  def report(): Seq[Verdict] = synchronized {
    rules.map { r =>
      val v = r match {
        case RowCount(lo, hi) => if (n >= lo && n <= hi) 0L else 1L
        case _ => viol(r)
      }
      val metric = if (n == 0) v * 1000L else v * 1000L / n
      Verdict(Expectations.ruleNamePublic(r), Expectations.ruleColPublic(r),
        v, metric, Expectations.thresholdPublic(r),
        metric <= Expectations.thresholdPublic(r))
    }
  }

  /** True iff every rule currently passes — the load-gate bit. */
  def allPass: Boolean = report().forall(_.pass)

  /** Attach to a streaming frame. */
  def attach(stream: DataFrame): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch((b: DataFrame, _: Long) => addBatch(b))
      .start()
}
