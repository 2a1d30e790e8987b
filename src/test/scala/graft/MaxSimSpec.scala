package graft

import graft.ops.MaxSim
import org.apache.spark.sql.functions._

/** Late-interaction MaxSim: golden scores on a hand-checkable corpus,
  * pruning soundness (shortlist scores ≡ exact scores), and the
  * self-doc exclusion.
  */
class MaxSimSpec extends SparkSpec {

  private def toks(rows: (Long, Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("doc_id", "tok", "embedding")
      .withColumn("vec_id", col("doc_id") * 100 + col("tok"))
      .select("doc_id", "tok", "vec_id", "embedding")
  }

  test("golden: sum of per-query-token maxes, exact integer micro") {
    // doc 0 (query): tokens along x and y; doc 1 aligned, doc 2 diagonal
    val d = toks(
      (0L, 0L, Seq(1f, 0f)), (0L, 1L, Seq(0f, 1f)),
      (1L, 0L, Seq(2f, 0f)), (1L, 1L, Seq(0f, 3f)),
      (2L, 0L, Seq(1f, 1f)), (2L, 1L, Seq(1f, 1f)))
    val r = MaxSim.scoreExact(d, d.where(col("doc_id") === 0), k = 5)
      .orderBy("rnk").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // vs doc1: qx·(2,0)=1.0, qy·(0,3)=1.0 -> 2_000_000
    // vs doc2: qx best cos=0.707107, qy best 0.707107 -> 1_414_214
    assert(r.toSeq == Seq((0L, 1L, 1L, 2000000L), (0L, 2L, 2L, 1414214L)))
  }

  test("self doc never scored") {
    val d = toks((0L, 0L, Seq(1f, 0f)), (1L, 0L, Seq(1f, 0f)))
    val r = MaxSim.scoreExact(d, d, k = 3).collect()
    assert(r.forall(x => x.getLong(0) != x.getLong(2)))
  }

  test("pruned shortlist scores are bit-identical to exact on survivors") {
    import spark.implicits._
    val base = (0 until 16).flatMap { doc =>
      (0 until 2).map { t =>
        val v = (0 until 8).map(i =>
          (math.sin(doc * 2.7 + t * 1.3 + i) * 10).toFloat)
        (doc.toLong, t.toLong, v)
      }
    }
    val d = toks(base: _*)
    val q = d.where(col("doc_id") < 2)
    val exact = MaxSim.scoreExact(d, q, k = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val pruned = MaxSim.scoreLshPruned(d, q, k = 16, nPlanes = 3, dims = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3))
    assert(pruned.nonEmpty)
    pruned.foreach { case (key, s) => assert(exact(key) == s) }
  }

  test("multiVector splits vec_id into doc and token slots") {
    import spark.implicits._
    val e = Seq((0L, Seq(1f)), (1L, Seq(1f)), (4L, Seq(1f)))
      .toDF("vec_id", "embedding")
    val mv = MaxSim.multiVector(e, "vec_id", 4)
      .select("doc_id", "tok").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mv.toSet == Set((0L, 0L), (0L, 1L), (1L, 0L)))
  }

  test("plan: query side broadcasts — no sort-merge join anywhere") {
    val d = toks((0L, 0L, Seq(1f, 0f)), (1L, 0L, Seq(0f, 1f)),
      (2L, 0L, Seq(1f, 1f)))
    val plan = MaxSim.scoreExact(d, d.where(col("doc_id") === 0), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), s"no broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }
}
