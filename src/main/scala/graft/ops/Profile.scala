package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact data profiling: per-column non-null count, null count,
  * distinct count, min and max — the data-quality gate an ingest
  * pipeline runs before trusting a source drop.
  *
  * Narrow profiles (<= [[Profile.OnePassMaxCols]] columns) run as ONE
  * pass: every column's aggregates in a single Aggregate (the
  * multi-count-distinct lowers to one Expand + HashAggregate), the
  * wide row reshaped to one row per column with `stack` — no
  * per-column scans, no driver loops. WIDE profiles delegate to
  * [[profileNumericGrouped]]: the single Expand multiplies the scan
  * ncols+1-fold into ONE aggregate whose per-group state covers every
  * distinct-count at once, and past a handful of columns the smaller
  * per-pass hash state wins decisively over the saved scans
  * (BenchScale x20, 8 lineitem columns: grouped 7.6 s vs one-pass
  * 35 s). min/max surface as double (exact for the numeric/date
  * profile set and render-stable across engines, unlike
  * decimal/float strings).
  */
object Profile {

  /** Measured crossover: up to 4 columns the one-pass Expand is the
    * right plan; beyond it the grouped passes win (see scaladoc).
    */
  val OnePassMaxCols = 4

  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame =
    if (cols.length <= OnePassMaxCols) profileNumericOnePass(df, cols)
    else profileNumericGrouped(df, cols, groupSize = 2)

  def profileNumericOnePass(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"${c}__n"),
      (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct"),
      min(col(c)).cast("double").as(s"${c}__min"),
      max(col(c)).cast("double").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__n`, `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${cols.length}, $stackArgs) AS (column, n, n_nulls, n_distinct, min_d, max_d)")
  }

  /** Per-column-group variant: identical output, but the profile runs
    * as ⌈cols/groupSize⌉ separate scans whose Expand factor is only
    * groupSize+1 each, instead of one scan expanded ncols+1-fold.
    * Total expanded row volume is HIGHER (n·(cols + cols/groupSize)
    * vs n·(cols+1)), but each aggregate's hash state is a fraction of
    * the one-pass giant — measured 4.6x faster at 8 columns x 12M
    * rows (BenchScale profile_onepass / profile_grouped rows), which
    * is why [[profileNumeric]] delegates here above
    * [[OnePassMaxCols]] columns.
    */
  def profileNumericGrouped(df: DataFrame, cols: Seq[String],
                            groupSize: Int = 2): DataFrame =
    cols.grouped(math.max(groupSize, 1))
      .map(g => profileNumericOnePass(df, g))
      .reduce(_ unionAll _)
}
