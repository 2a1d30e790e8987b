package graft

import graft.ops.LinearProbe
import org.apache.spark.sql.functions._

/** OLS probe: exact recovery on exactly-linear data, residual-outlier
  * ranking, and the all-aggregation plan shape (no collect, one
  * scalar cross join).
  */
class LinearProbeSpec extends SparkSpec {
  import spark.implicits._

  test("exactly linear data recovers the coefficients, residuals 0") {
    // y = 2 + 3*x1 + 5*x2, integer features, non-degenerate design
    val df = Seq((1L, 1L, 1L), (2L, 2L, 1L), (3L, 1L, 2L), (4L, 3L, 5L),
        (5L, 7L, 2L))
      .toDF("id", "x1", "x2")
      .withColumn("y", lit(2L) + col("x1") * 3L + col("x2") * 5L)
    val fit = LinearProbe.fit(df, col("x1"), col("x2"), col("y"))
      .select("b0_micro", "b1_micro", "b2_micro").head()
    assert((fit.getLong(0), fit.getLong(1), fit.getLong(2)) ==
      (2000000L, 3000000L, 5000000L))
    val out = LinearProbe.residualOutliers(df, "id", col("x1"), col("x2"),
      col("y"), k = 5).collect()
    assert(out.length == 5 && out.forall(_.getLong(2) == 0L))
  }

  test("the planted outlier ranks first; ties break by id") {
    // ten points on y = 10*x1 + x2 (x2 varied — a constant feature is
    // a singular design and fit fails loudly, spec'd below) plus one
    // MID-RANGE point shifted +1000 (low leverage, so the fit cannot
    // rotate the residual away like an edge outlier would)
    val clean = (1L to 10L).map(i => (i, i, i % 3, 10 * i + i % 3))
    val df = (clean :+ ((99L, 5L, 2L, 1052L + 1000L)))
      .toDF("id", "x1", "x2", "y")
    val out = LinearProbe.residualOutliers(df, "id", col("x1"), col("x2"),
      col("y"), k = 5).collect()
    assert(out.head.getLong(1) == 99L, s"outlier not first: ${out.toSeq}")
    // rnk is dense 1..5 and ordered by res_abs desc
    assert(out.map(_.getLong(0)).toSeq == (1L to 5L))
    val res = out.map(_.getLong(2)).toSeq
    assert(res == res.sortBy(-_))
  }

  test("grouped fit recovers each group's coefficients independently") {
    // group a: y = 1 + 2*x1 + 3*x2 ; group b: y = 5 + 7*x1 + 1*x2 —
    // a pooled fit could satisfy neither; the grouped fit must nail both
    val pts = Seq((1L, 1L), (2L, 1L), (1L, 2L), (3L, 5L), (7L, 2L))
    val rows =
      pts.zipWithIndex.map { case ((a, b), i) =>
        (i.toLong, "a", a, b, 1L + 2L * a + 3L * b) } ++
      pts.zipWithIndex.map { case ((a, b), i) =>
        (100L + i, "b", a, b, 5L + 7L * a + 1L * b) }
    val df = rows.toDF("id", "grp", "x1", "x2", "y")
    val fit = graft.ops.LinearProbe
      .fitGrouped(df, "grp", col("x1"), col("x2"), col("y"))
      .select("grp", "b0_micro", "b1_micro", "b2_micro")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(fit("a") == ((1000000L, 2000000L, 3000000L)))
    assert(fit("b") == ((5000000L, 7000000L, 1000000L)))
    val out = graft.ops.LinearProbe.residualOutliersGrouped(df, "id", "grp",
      col("x1"), col("x2"), col("y"), kPerGroup = 3).collect()
    assert(out.length == 6 && out.forall(_.getLong(3) == 0L))
    // rank restarts per group
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set("a", "b").flatMap(g => (1L to 3L).map(g -> _)))
  }

  test("singular design (collinear features) fails loudly, not silently") {
    val df = Seq((1L, 1L, 1L, 10L), (2L, 2L, 1L, 20L), (3L, 3L, 1L, 30L))
      .toDF("id", "x1", "x2", "y") // x2 constant: [1, x2] dependent
    intercept[Exception] {
      LinearProbe.fit(df, col("x1"), col("x2"), col("y")).collect()
    }
  }

  test("plan: one aggregation + broadcast scalar join, no collect shape") {
    val df = Seq((1L, 1L, 1L, 10L), (2L, 2L, 3L, 21L), (3L, 4L, 2L, 35L))
      .toDF("id", "x1", "x2", "y")
    val plan = LinearProbe.residualOutliers(df, "id", col("x1"), col("x2"),
      col("y"), k = 2).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"coefficients not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }
}
