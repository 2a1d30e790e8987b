package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join via time-bin bucketing — the equi-join
  * reduction of the inherently non-equi predicate
  * `a.start <= b.end && b.start <= a.end`.
  *
  * A naive overlap join is a cross join with a filter (quadratic, a
  * CartesianProduct at any scale). Bucketing by fixed-width time bins
  * makes it an equi-join: an interval [s, e] registers in bins
  * s/w .. e/w, and two intervals overlap ONLY IF they share a bin —
  * so the bin equi-join is a lossless candidate generator, and the
  * exact predicate verifies candidates only (the FuzzyJoin discipline
  * applied to time).
  *
  * Duplicate suppression is algebraic, not a shuffle: a pair sharing
  * k bins would match k times, so the join keeps only the FIRST
  * shared bin — `bin == greatest(a.start, b.start) div w`, a
  * per-pair constant — and emits each pair exactly once. No
  * post-join `distinct`.
  *
  * Scale: shuffle volume is O(total bins touched) = O(rows ×
  * avg_interval/w); `binWidth` trades replication against bucket
  * density (pick ~ the median interval length). Long-tail intervals
  * replicate proportionally — cap them upstream or split the tail
  * stratum. Candidate volume per bin is freq² — same hot-bucket
  * failure mode as any LSH family; densely-overlapping workloads
  * (everything spans everything) degrade to quadratic because the
  * OUTPUT is quadratic.
  */
object IntervalJoin {

  /** All overlapping pairs between `a` and `b`. Both frames must
    * carry long columns `startCol`/`endCol` (inclusive, end >= start);
    * every column of `a` returns prefixed `a_`, of `b` prefixed `b_`,
    * plus `overlap_us = least(ends) - greatest(starts)`.
    * `extraCond` (over the prefixed columns) is pushed into the join,
    * e.g. an anti-reflexivity key for self-joins.
    */
  def overlapJoin(a: DataFrame, b: DataFrame, startCol: String,
                  endCol: String, binWidth: Long,
                  extraCond: Column = lit(true)): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1 (got $binWidth)")
    def binned(df: DataFrame, p: String): DataFrame = {
      val renamed = df.select(df.columns.map(c => col(c).as(s"$p$c")): _*)
      renamed.withColumn("bin", explode(expr(
        s"sequence($p$startCol div $binWidth, $p$endCol div $binWidth)")))
    }
    val aa = binned(a, "a_")
    val bb = binned(b, "b_").withColumnRenamed("bin", "bin_b")
    val aS = col(s"a_$startCol"); val aE = col(s"a_$endCol")
    val bS = col(s"b_$startCol"); val bE = col(s"b_$endCol")
    aa.join(bb,
        col("bin") === col("bin_b") &&
          aS <= bE && bS <= aE &&
          col("bin") === expr(
            s"greatest(a_$startCol, b_$startCol) div $binWidth") &&
          extraCond)
      .drop("bin", "bin_b")
      .withColumn("overlap_us", least(aE, bE) - greatest(aS, bS))
  }

  /** Brute-force reference (cross join + filter) for specs. */
  def bruteForce(a: DataFrame, b: DataFrame, startCol: String,
                 endCol: String, extraCond: Column = lit(true)): DataFrame = {
    val aa = a.select(a.columns.map(c => col(c).as(s"a_$c")): _*)
    val bb = b.select(b.columns.map(c => col(c).as(s"b_$c")): _*)
    val aS = col(s"a_$startCol"); val aE = col(s"a_$endCol")
    val bS = col(s"b_$startCol"); val bE = col(s"b_$endCol")
    aa.join(bb, aS <= bE && bS <= aE && extraCond)
      .withColumn("overlap_us", least(aE, bE) - greatest(aS, bS))
  }
}
