package graft

import graft.ops.{Projection, Similarity}
import org.apache.spark.sql.functions._

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  /** The op's sign formula, re-derived independently (1-based i, j). */
  private def sign(i: Int, j: Int): Long =
    if ((i.toLong * 2654435761L + j.toLong * 40503L) % 97 % 2 == 0) 1L else -1L

  test("projection is map-only: zero Exchange in the plan") {
    val p = Projection.rademacher(emb, "vec_id", k = 8)
    val plan = p.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }

  test("one-hot vectors read the sign matrix back exactly") {
    // e_i projects to 1e6 * sign(i, j) in coordinate j — the formula
    // itself, observed through the full op
    val oneHots = (1 to 8).map { i =>
      (i.toLong, Array.tabulate(8)(d => if (d == i - 1) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
    val got = Projection.rademacher(oneHots, "vec_id", k = 4)
      .select(col("vec_id"), col("proj"))
      .as[(Long, Seq[Long])].collect().toMap
    (1 to 8).foreach { i =>
      val expect = (1 to 4).map(j => 1000000L * sign(i, j))
      assert(got(i.toLong) == expect, s"one-hot $i")
    }
  }

  test("JL energy preservation: pnorm2/k tracks |x|^2 for most of the corpus") {
    val p = Projection.rademacher(emb, "vec_id", k = 8)
      .withColumn("pnorm2", expr("aggregate(proj, 0L, (acc, x) -> acc + x*x)"))
    val nn = Similarity.withQuantized(emb, "embedding").select("vec_id", "nn")
    val ratios = p.join(nn, "vec_id")
      .select((col("pnorm2").cast("double") / lit(8.0) / col("nn").cast("double"))
        .as("r"))
      .as[Double].collect()
    assert(ratios.nonEmpty)
    val inBand = ratios.count(r => r >= 0.25 && r <= 4.0)
    assert(inBand.toDouble / ratios.length >= 0.8,
      s"only $inBand/${ratios.length} vectors within 4x energy band")
  }

  test("native expression == HOF formula, codegen and interpreted") {
    val a = graft.ops.Projection.rademacher(emb, "vec_id", k = 8)
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val b = graft.ops.Projection.rademacherHof(emb, "vec_id", k = 8)
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(a == b)
    // interpreted eval path (no codegen) agrees too
    import graft.functions.RademacherProject
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val ei = new GenericArrayData(Array[Long](1000000L, -2000000L, 3000000L))
    val interp = RademacherProject.compute(ei, 4)
    val viaExpr = RademacherProject(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1000000L, -2000000L, 3000000L),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false)), 4)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(interp.toLongArray.toSeq == viaExpr.toLongArray.toSeq)
  }

  test("deterministic under repartitioning") {
    val a = Projection.rademacher(emb, "vec_id", k = 8)
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val b = Projection.rademacher(emb.repartition(7), "vec_id", k = 8)
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}
