package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed ordinary-least-squares fit of a tiny linear model —
  * the "quality probe" of an LLM data pipeline (fit interpretable
  * coefficients relating cheap per-doc signals, score every doc,
  * surface the residual outliers as curation candidates). Model
  * FITTING expressed as aggregation: no driver-side math, no
  * iterative solver, no collect.
  *
  * Scale shape: ONE map-side-combined aggregation computes the exact
  * normal-equation sums (n, Σx1, Σx2, Σx1², Σx1x2, Σx2², Σy, Σx1y,
  * Σx2y — every sum a BIGINT over integer features, so the reduction
  * is order-independent and bit-stable under any partitioning); the
  * 3×3 system solves IN-PLAN by Cramer's rule on the one-row sums
  * frame; scoring joins the one-row coefficient frame back to the
  * docs (scalar cross join — the q91/q115 broadcast shape). Total
  * cost: two scans (sums, score) + one 1-row broadcast.
  *
  * Determinism contract: the sums are exact integers; determinants
  * and coefficients are IEEE doubles computed by the SAME formula
  * tree in Spark and DuckDB over the same exact integers — identical
  * operand order, so bit-identical results (the q152
  * floor-of-IEEE-quotient precedent) — and every OUTPUT value is a
  * micro-rounded BIGINT, so the oracle comparison is exact.
  * Guard rails: sums must stay under 2^53 for the double conversion
  * to be exact — with 64-bit feature magnitudes ≤ 1e4 that holds to
  * ~1e9 rows; larger corpora pre-scale features (documented, same
  * contract as [[Ivf]]'s |sum| < 2^53 parity guard).
  */
object LinearProbe {

  /** Cramer 3x3 determinant over column expressions (doubles). */
  private def det3(a: Seq[Seq[Column]]): Column =
    a(0)(0) * (a(1)(1) * a(2)(2) - a(1)(2) * a(2)(1)) -
      a(0)(1) * (a(1)(0) * a(2)(2) - a(1)(2) * a(2)(0)) +
      a(0)(2) * (a(1)(0) * a(2)(1) - a(1)(1) * a(2)(0))

  /** The nine exact-integer normal-equation sums. Features are cast
    * to BIGINT BEFORE forming the products — matching the DuckDB
    * oracle's cast-then-multiply order — so IntegerType inputs whose
    * per-row product exceeds 2^31 multiply in 64-bit on both engines
    * instead of tripping Spark's ANSI int overflow.
    */
  private def sumExprs(x1c: Column, x2c: Column, yc: Column): Seq[Column] = {
    val (x1, x2, y) = (x1c.cast(LongType), x2c.cast(LongType), yc.cast(LongType))
    Seq(
      count(lit(1)).as("n"),
      sum(x1).as("s1"),
      sum(x2).as("s2"),
      sum(x1 * x1).as("s11"),
      sum(x1 * x2).as("s12"),
      sum(x2 * x2).as("s22"),
      sum(y).as("sy"),
      sum(x1 * y).as("s1y"),
      sum(x2 * y).as("s2y"))
  }

  /** Raw Cramer coefficients `_b0.._b2` over a sums frame's columns. */
  private def rawCoefExprs: Seq[Column] = {
    def d(c: String) = col(c).cast("double")
    val A = Seq(
      Seq(d("n"), d("s1"), d("s2")),
      Seq(d("s1"), d("s11"), d("s12")),
      Seq(d("s2"), d("s12"), d("s22")))
    val b = Seq(d("sy"), d("s1y"), d("s2y"))
    def replaceCol(j: Int) = A.zipWithIndex.map { case (row, i) =>
      row.updated(j, b(i))
    }
    val det = det3(A)
    (0 to 2).map(j => (det3(replaceCol(j)) / det).as(s"_b$j"))
  }

  private def microCoefExprs: Seq[Column] = (0 to 2).map(j =>
    round(col(s"_b$j") * 1e6).cast(LongType).as(s"b${j}_micro"))

  /** One-row frame of micro-rounded OLS coefficients (b0, b1, b2) for
    * y ~ b0 + b1·x1 + b2·x2, plus the raw double columns `_b0.._b2`
    * for in-plan scoring. `x1`/`x2`/`y` must be integer-typed
    * expressions over `df`'s rows. A SINGULAR design (collinear or
    * constant features) fails loudly with the engine's ANSI
    * divide-by-zero on the Cramer solve — by design: silently
    * NULL coefficients would score every doc as an outlier.
    */
  def fit(df: DataFrame, x1: Column, x2: Column, y: Column): DataFrame =
    df.agg(sumExprs(x1, x2, y).head, sumExprs(x1, x2, y).tail: _*)
      .select(rawCoefExprs: _*)
      .select(col("_b0") +: col("_b1") +: col("_b2") +: microCoefExprs: _*)

  /** Per-GROUP OLS — segmented calibration (one model per language /
    * source / domain) in the same two scans: the sums aggregate gains
    * a group key, the Cramer solve runs per group row, and the
    * coefficient frame stays #groups rows — broadcastable by
    * construction. Same determinism contract and singular-design
    * behavior as [[fit]], per group.
    */
  def fitGrouped(df: DataFrame, groupCol: String, x1: Column, x2: Column,
                 y: Column): DataFrame =
    df.groupBy(col(groupCol))
      .agg(sumExprs(x1, x2, y).head, sumExprs(x1, x2, y).tail: _*)
      .select(col(groupCol) +: rawCoefExprs: _*)
      .select(col(groupCol) +: col("_b0") +: col("_b1") +: col("_b2") +:
        microCoefExprs: _*)

  /** Top-`k` residual outliers under the fit: docs whose y departs
    * most from the model's prediction — the curation shortlist.
    * Output (rnk, id, res_abs_micro, b0_micro, b1_micro, b2_micro),
    * rank by (|residual| desc, id): every value a BIGINT.
    */
  def residualOutliers(df: DataFrame, idCol: String, x1: Column, x2: Column,
                       y: Column, k: Int): DataFrame = {
    val fitted = fit(df, x1, x2, y)
    val scored = df
      .select(col(idCol), x1.cast("double").as("_x1"),
        x2.cast("double").as("_x2"), y.cast("double").as("_y"))
      .crossJoin(broadcast(fitted))
      .withColumn("res_abs_micro",
        abs(round((col("_y") - (col("_b0") + col("_b1") * col("_x1") +
          col("_b2") * col("_x2"))) * 1e6)).cast(LongType))
    val w = Window.orderBy(col("res_abs_micro").desc, col(idCol))
    scored
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .where(col("rnk") <= k)
      .select(col("rnk"), col(idCol), col("res_abs_micro"),
        col("b0_micro"), col("b1_micro"), col("b2_micro"))
  }

  /** Per-group residual outliers under [[fitGrouped]]: each doc is
    * scored against ITS group's model (the #groups-row coefficient
    * frame broadcasts onto one corpus scan), top `kPerGroup` by
    * (|residual| desc, id) within each group. Output (<groupCol>,
    * rnk, <idCol>, res_abs_micro, b0_micro, b1_micro, b2_micro).
    */
  def residualOutliersGrouped(df: DataFrame, idCol: String, groupCol: String,
                              x1: Column, x2: Column, y: Column,
                              kPerGroup: Int): DataFrame = {
    val fitted = fitGrouped(df, groupCol, x1, x2, y)
    val scored = df
      .select(col(groupCol), col(idCol), x1.cast("double").as("_x1"),
        x2.cast("double").as("_x2"), y.cast("double").as("_y"))
      .join(broadcast(fitted), groupCol)
      .withColumn("res_abs_micro",
        abs(round((col("_y") - (col("_b0") + col("_b1") * col("_x1") +
          col("_b2") * col("_x2"))) * 1e6)).cast(LongType))
    val w = Window.partitionBy(groupCol)
      .orderBy(col("res_abs_micro").desc, col(idCol))
    scored
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .where(col("rnk") <= kPerGroup)
      .select(col(groupCol), col("rnk"), col(idCol), col("res_abs_micro"),
        col("b0_micro"), col("b1_micro"), col("b2_micro"))
  }

  /** DuckDB replay: the identical sums, Cramer tree, and micro
    * rounding over `rel` with integer expressions `x1`/`x2`/`y` and
    * key `idCol`. Emits (rnk, <idCol>, res_abs_micro, b0_micro,
    * b1_micro, b2_micro) ordered by rnk.
    */
  /** [[residualOutliersGrouped]]'s replay: same trees, sums GROUP BY
    * the group key, rank within group. Emits (<groupCol>, rnk,
    * <idCol>, res_abs_micro, b*_micro) ordered by (<groupCol>, rnk).
    */
  def residualOutliersGroupedSql(rel: String, idCol: String,
                                 groupCol: String, x1: String, x2: String,
                                 y: String, kPerGroup: Int): String = {
    def det(a: Seq[Seq[String]]) =
      s"""(${a(0)(0)} * (${a(1)(1)} * ${a(2)(2)} - ${a(1)(2)} * ${a(2)(1)})
         - ${a(0)(1)} * (${a(1)(0)} * ${a(2)(2)} - ${a(1)(2)} * ${a(2)(0)})
         + ${a(0)(2)} * (${a(1)(0)} * ${a(2)(1)} - ${a(1)(1)} * ${a(2)(0)}))"""
    val A = Seq(
      Seq("dn", "d1", "d2"),
      Seq("d1", "d11", "d12"),
      Seq("d2", "d12", "d22"))
    val b = Seq("dy", "d1y", "d2y")
    def repl(j: Int) = A.zipWithIndex.map { case (row, i) => row.updated(j, b(i)) }
    s"""WITH feats AS (SELECT $groupCol AS grp, $idCol AS id,
            CAST($x1 AS BIGINT) AS x1, CAST($x2 AS BIGINT) AS x2,
            CAST($y AS BIGINT) AS y FROM $rel),
        sums AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
            SUM(x1) AS s1, SUM(x2) AS s2, SUM(x1*x1) AS s11,
            SUM(x1*x2) AS s12, SUM(x2*x2) AS s22,
            SUM(y) AS sy, SUM(x1*y) AS s1y, SUM(x2*y) AS s2y
          FROM feats GROUP BY grp),
        dbl AS (SELECT grp, CAST(n AS DOUBLE) AS dn, CAST(s1 AS DOUBLE) AS d1,
            CAST(s2 AS DOUBLE) AS d2, CAST(s11 AS DOUBLE) AS d11,
            CAST(s12 AS DOUBLE) AS d12, CAST(s22 AS DOUBLE) AS d22,
            CAST(sy AS DOUBLE) AS dy, CAST(s1y AS DOUBLE) AS d1y,
            CAST(s2y AS DOUBLE) AS d2y
          FROM sums),
        coef AS (SELECT grp,
            ${det(repl(0))} / ${det(A)} AS b0,
            ${det(repl(1))} / ${det(A)} AS b1,
            ${det(repl(2))} / ${det(A)} AS b2
          FROM dbl),
        scored AS (SELECT f.grp, f.id,
            CAST(abs(round((CAST(f.y AS DOUBLE) - (c.b0
              + c.b1 * CAST(f.x1 AS DOUBLE)
              + c.b2 * CAST(f.x2 AS DOUBLE))) * 1000000)) AS BIGINT)
              AS res_abs_micro,
            CAST(round(c.b0 * 1000000) AS BIGINT) AS b0_micro,
            CAST(round(c.b1 * 1000000) AS BIGINT) AS b1_micro,
            CAST(round(c.b2 * 1000000) AS BIGINT) AS b2_micro
          FROM feats f JOIN coef c ON c.grp = f.grp)
        SELECT grp AS $groupCol,
          CAST(ROW_NUMBER() OVER (PARTITION BY grp
            ORDER BY res_abs_micro DESC, id) AS BIGINT) AS rnk,
          id AS $idCol, res_abs_micro, b0_micro, b1_micro, b2_micro
        FROM scored
        QUALIFY rnk <= $kPerGroup
        ORDER BY $groupCol, rnk"""
  }

  def residualOutliersSql(rel: String, idCol: String, x1: String, x2: String,
                          y: String, k: Int): String = {
    def det(a: Seq[Seq[String]]) =
      s"""(${a(0)(0)} * (${a(1)(1)} * ${a(2)(2)} - ${a(1)(2)} * ${a(2)(1)})
         - ${a(0)(1)} * (${a(1)(0)} * ${a(2)(2)} - ${a(1)(2)} * ${a(2)(0)})
         + ${a(0)(2)} * (${a(1)(0)} * ${a(2)(1)} - ${a(1)(1)} * ${a(2)(0)}))"""
    val A = Seq(
      Seq("dn", "d1", "d2"),
      Seq("d1", "d11", "d12"),
      Seq("d2", "d12", "d22"))
    val b = Seq("dy", "d1y", "d2y")
    def repl(j: Int) = A.zipWithIndex.map { case (row, i) => row.updated(j, b(i)) }
    s"""WITH feats AS (SELECT $idCol AS id,
            CAST($x1 AS BIGINT) AS x1, CAST($x2 AS BIGINT) AS x2,
            CAST($y AS BIGINT) AS y FROM $rel),
        sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            SUM(x1) AS s1, SUM(x2) AS s2, SUM(x1*x1) AS s11,
            SUM(x1*x2) AS s12, SUM(x2*x2) AS s22,
            SUM(y) AS sy, SUM(x1*y) AS s1y, SUM(x2*y) AS s2y
          FROM feats),
        dbl AS (SELECT CAST(n AS DOUBLE) AS dn, CAST(s1 AS DOUBLE) AS d1,
            CAST(s2 AS DOUBLE) AS d2, CAST(s11 AS DOUBLE) AS d11,
            CAST(s12 AS DOUBLE) AS d12, CAST(s22 AS DOUBLE) AS d22,
            CAST(sy AS DOUBLE) AS dy, CAST(s1y AS DOUBLE) AS d1y,
            CAST(s2y AS DOUBLE) AS d2y
          FROM sums),
        coef AS (SELECT
            ${det(repl(0))} / ${det(A)} AS b0,
            ${det(repl(1))} / ${det(A)} AS b1,
            ${det(repl(2))} / ${det(A)} AS b2
          FROM dbl),
        scored AS (SELECT f.id,
            CAST(abs(round((CAST(f.y AS DOUBLE) - (c.b0
              + c.b1 * CAST(f.x1 AS DOUBLE)
              + c.b2 * CAST(f.x2 AS DOUBLE))) * 1000000)) AS BIGINT)
              AS res_abs_micro,
            CAST(round(c.b0 * 1000000) AS BIGINT) AS b0_micro,
            CAST(round(c.b1 * 1000000) AS BIGINT) AS b1_micro,
            CAST(round(c.b2 * 1000000) AS BIGINT) AS b2_micro
          FROM feats f CROSS JOIN coef c)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY res_abs_micro DESC, id)
            AS BIGINT) AS rnk,
          id AS $idCol, res_abs_micro, b0_micro, b1_micro, b2_micro
        FROM scored
        QUALIFY rnk <= $k
        ORDER BY rnk"""
  }
}
