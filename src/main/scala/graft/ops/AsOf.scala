package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical "operator Spark lacks".
  *
  * Composed from built-ins per the preference order (no custom
  * SparkPlan needed): tag both sides, union, and carry the latest
  * right-side values forward with `last(..., ignoreNulls)` over a
  * (key, ts, side) window. Exactly ONE shuffle on the key and one
  * in-partition sort — the same cost as a sort-merge join, with none
  * of the range-condition blowup a naive `l.ts >= r.ts` join-filter
  * would produce (that plan is a broadcast-nested-loop at scale).
  *
  * Semantics: for each left row, the right row with the same `key`
  * and the greatest `rightTs <= leftTs` (ties: right row applies —
  * inclusive as-of). Right side must be unique per (key, rightTs) for
  * deterministic results.
  */
object AsOf {

  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, rightVals: Seq[String],
               suffix: String = "_asof"): DataFrame = {
    val rightRenamed = rightVals.map(c => c -> s"$c$suffix")

    val lPrepped = rightRenamed.foldLeft(
      left.withColumn("_k", col(key))
        .withColumn("_ts", col(leftTs))
        .withColumn("_side", lit(1))) { case (df, (orig, renamed)) =>
      df.withColumn(renamed, lit(null).cast(right.schema(orig).dataType))
    }

    val rBase = right.select(
      (Seq(col(key).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side")) ++
        rightRenamed.map { case (orig, renamed) => col(orig).as(renamed) }): _*)
    val rPrepped = left.columns.foldLeft(rBase) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val unioned = lPrepped.unionByName(rPrepped)
    // right rows (_side 0) sort before left rows at equal ts -> inclusive
    val w = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightRenamed.foldLeft(unioned) { case (df, (_, renamed)) =>
      df.withColumn(renamed, last(col(renamed), ignoreNulls = true).over(w))
    }
    filled.where(col("_side") === 1).drop("_k", "_ts", "_side")
  }

  /** [[joinAsOf]] through the NATIVE operator
    * ([[graft.plans.AsOfJoin]] → `AsOfJoinExec`): identical semantics
    * and output columns, planned as a direct sorted-merge — one
    * forward pass per co-partition, one buffered right row of state,
    * no union widening and no window machinery. Same
    * one-Exchange-per-side layout as a sort-merge join.
    *
    * The right subtree is re-aliased internally, so joining a table
    * to a projection of ITSELF (the q56 shape) is safe — the minted
    * attribute ids cannot collide with the left side's.
    *
    * `tolerance` (kdb wj-style bounded staleness) turns a match whose
    * `leftTs - rightTs` exceeds the bound into a no-match — in the ts
    * column's physical long units (µs for TimestampType); requires a
    * long-backed ts type. Because the as-of match is already the
    * LATEST right row <= leftTs, the bound is exactly "no right row
    * within the window".
    */
  def joinAsOfNative(left: DataFrame, right: DataFrame, key: String,
                     leftTs: String, rightTs: String, rightVals: Seq[String],
                     suffix: String = "_asof",
                     tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val spark = left.sparkSession
    // aliasing mints fresh exprIds on the right — required when both
    // sides derive from one scan, and it lands the output value names
    val rPrepped = right.select(
      col(key).as("_asof_k") +: col(rightTs).as("_asof_ts") +:
        rightVals.map(v => col(v).as(s"$v$suffix")): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rPrepped.queryExecution.analyzed
    def attrOf(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
               n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    val vals = rightVals.map(v => attrOf(rPlan, s"$v$suffix"))
    // the output attributes are FRESH (new exprIds), produced by the
    // node itself: reusing the right child's ids would let the
    // analyzer's UpdateAttributeNullability rewrite them back to the
    // child's non-nullable form, and a no-match null then reads as 0
    val out = vals.map(v =>
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        v.name, v.dataType, nullable = true)())
    ColumnBridge.ofRows(spark, graft.plans.AsOfJoin(
      lPlan, rPlan,
      attrOf(lPlan, key), attrOf(rPlan, "_asof_k"),
      attrOf(lPlan, leftTs), attrOf(rPlan, "_asof_ts"),
      vals, out, tolerance))
  }
}
