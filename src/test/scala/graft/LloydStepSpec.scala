package graft

import graft.ops.Ivf
import org.apache.spark.sql.functions._

class LloydStepSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  private def inertia(corpus: org.apache.spark.sql.DataFrame,
                      m: Ivf.QuantModel): Long =
    Ivf.cellStatsQuantized(corpus, m).agg(sum("inertia")).as[Long].head()

  test("one Lloyd step never increases exact inertia") {
    val m0 = Ivf.fitQuantized(emb, "vec_id", nLists = 4)
    val m1 = Ivf.lloydStepQuantized(emb, m0)
    val (i0, i1) = (inertia(emb, m0), inertia(emb, m1))
    // floor-mean sits within 1 micro-unit per dim of the true mean, so
    // the classic monotonicity argument survives the flooring here
    assert(i1 <= i0, s"inertia rose: $i0 -> $i1")
    assert(i1 > 0)
  }

  test("the step is deterministic and partitioning-independent") {
    val m0 = Ivf.fitQuantized(emb, "vec_id", nLists = 4)
    val a = Ivf.lloydStepQuantized(emb, m0)
    val b = Ivf.lloydStepQuantized(emb.repartition(13), m0)
    assert(a == b)
  }

  test("an empty cell keeps its previous centroid") {
    val rows = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1.1f, 0f)),
      (3L, Array(0f, 1f)), (4L, Array(0f, 1.2f)))
      .toDF("vec_id", "embedding")
    // third centroid is far from every row: nobody assigns to it
    val far = Seq(9000000L, 9000000L)
    val m = Ivf.QuantModel(Seq(
      (0, Seq(1000000L, 0L)), (1, Seq(0L, 1000000L)), (2, far)))
    val m1 = Ivf.lloydStepQuantized(rows, m)
    assert(m1.centroids.find(_._1 == 2).get._2 == far)
    // the live cells moved to their members' floor-means
    assert(m1.centroids.find(_._1 == 0).get._2 == Seq(1050000L, 0L))
    assert(m1.centroids.find(_._1 == 1).get._2 == Seq(0L, 1100000L))
  }
}
