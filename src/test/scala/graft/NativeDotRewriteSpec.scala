package graft

import org.apache.spark.sql.functions._

/** The NativeDotRewrite optimizer rule (SparkSessionExtensions).
  * Sources are `range`-based, not local Seqs — local relations get
  * constant-folded by ConvertToLocalRelation before the plan can be
  * inspected.
  */
class NativeDotRewriteSpec extends SparkSpec {

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"

  test("HOF integer dot chains are rewritten to the native expression") {
    val df = spark.range(3).select(
      array(col("id"), col("id") + 1).as("a"),
      array(col("id") * 2, col("id") + 3).as("b"))
    val q = df.select(col("a"), col("b"), expr(hofDot).as("dot"))
    val optimized = q.queryExecution.optimizedPlan.toString.toLowerCase
    assert(optimized.contains("longdotproduct"),
      s"expected native rewrite in:\n$optimized")
    // id=2: [2,3]·[4,5] = 23
    assert(q.orderBy(col("dot").desc).head().getLong(2) == 23L)
  }

  test("rewrite preserves zip_with semantics on ragged arrays (null)") {
    val df = spark.range(1).select(
      array(col("id"), col("id") + 1, col("id") + 2).as("a"),
      array(col("id") * 2).as("b"))
    val q = df.select(expr(hofDot).as("dot"))
    assert(q.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("longdotproduct"))
    assert(q.head().isNullAt(0))
  }

  test("no rewrite for non-long arrays or different lambda shapes") {
    // double arrays: float addition is NOT associative, must stay HOF
    val dbl = spark.range(1).select(
      array(col("id") + 1.0, col("id") + 2.0).as("a"),
      array(col("id") + 3.0, col("id") + 4.0).as("b"))
    val qd = dbl.select(
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)").as("dot"))
    assert(!qd.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("longdotproduct"))
    assert(qd.head().getDouble(0) == 11.0)

    // a different combiner (sum of sums) must not be rewritten
    val q2 = spark.range(1).select(
        array(col("id") + 1, col("id") + 2).as("a"),
        array(col("id") + 3, col("id") + 4).as("b"))
      .select(expr("aggregate(zip_with(a, b, (x, y) -> x + y), 0L, (acc, v) -> acc + v)").as("s"))
    assert(!q2.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("longdotproduct"))
    assert(q2.head().getLong(0) == 10L)
  }
}
