package graft

import graft.ops.{AnnEval, GraphAnn, Similarity}
import org.apache.spark.sql.functions._

/** NN-Descent k-NN graph + beam search: bounded degree, exact edge
  * scores, determinism under partitioning, the NN-Descent monotone
  * convergence handle, exhaustive-setting equality with brute force,
  * and realistic-recall behavior on a clustered corpus.
  */
class GraphAnnSpec extends SparkSpec {
  import spark.implicits._

  /** 4 well-separated direction clusters in 8 dims, 50 vectors each,
    * deterministic jitter (IvfSpec's corpus shape).
    */
  private def clustered = {
    val base = Seq(
      Array(10f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 10f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 10f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 10f, 0f, 0f, 0f, 0f))
    val rows = for {
      c <- 0 until 4
      i <- 0 until 50
    } yield {
      val v = base(c).clone()
      (0 until 8).foreach { d =>
        v(d) = v(d) + (((c * 1315423911L + i * 2654435761L + d * 97L) % 100) / 100.0f)
      }
      ((c * 50 + i).toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  private val K = 4

  test("build: degree bounded by k, edge scores exactly the integer micro-cosine") {
    val g = GraphAnn.buildGraph(clustered, "vec_id", k = K,
      initBuckets = 16, iterations = 2)
    val maxDeg = g.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxDeg <= K, s"out-degree $maxDeg > k=$K")

    // every edge's sim must equal the exact quantized micro-cosine
    val c = Similarity.withQuantized(clustered, "embedding")
    val recomputed = g
      .join(c.select(col("vec_id").as("src"), col("ei").as("es"),
        col("nn").as("ns")), "src")
      .join(c.select(col("vec_id").as("dst"), col("ei").as("ed"),
        col("nn").as("nd")), "dst")
      .withColumn("expect", Similarity.cosineMicro(
        Similarity.dotLong(col("es"), col("ed")), col("ns"), col("nd")))
    assert(recomputed.where(col("sim_micro") =!= col("expect")).count() == 0)
  }

  test("build is deterministic under input partitioning") {
    val g1 = GraphAnn.buildGraph(clustered, "vec_id", k = K,
      initBuckets = 16, iterations = 1)
      .as[(Long, Long, Long)].collect().toSet
    val g2 = GraphAnn.buildGraph(clustered.repartition(7), "vec_id", k = K,
      initBuckets = 16, iterations = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(g1 == g2 && g1.nonEmpty)
  }

  test("NN-Descent rounds never degrade a node's k-th best similarity") {
    def kthBest(iters: Int): Map[Long, Long] =
      GraphAnn.buildGraph(clustered, "vec_id", k = K,
          initBuckets = 16, iterations = iters)
        .groupBy("src").agg(min("sim_micro").as("kth"), count(lit(1)).as("deg"))
        .where(col("deg") === K) // full nodes only: min == k-th best
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> r._2).toMap
    val r0 = kthBest(0)
    val r2 = kthBest(2)
    // a node with a full buffer at round 0 keeps a full buffer; its
    // k-th best weakly improves because each round re-takes top-k of
    // (previous edges ∪ new candidates)
    val regressed = r0.collect {
      case (n, v0) if r2.contains(n) && r2(n) < v0 => (n, v0, r2(n))
    }
    assert(regressed.isEmpty, s"degraded nodes: ${regressed.take(5)}")
    // and the refinement actually moves: some node strictly improved
    assert(r0.exists { case (n, v0) => r2.get(n).exists(_ > v0) })
  }

  test("search with entryStride=1 equals brute force exactly") {
    val corpus = clustered
    val queries = corpus.where($"vec_id" % 50 === 0)
    val g = GraphAnn.buildGraph(corpus, "vec_id", k = K,
      initBuckets = 16, iterations = 1)
    // stride 1 seeds the pool with the whole corpus: the beam search
    // must return exactly the brute-force ranking, graph regardless
    val got = GraphAnn.searchStrideEntries(g, corpus, queries, "vec_id",
        k = 5, beam = 4, hops = 2, entryStride = 1)
      .as[(Long, Long, Long, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", k = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == exact && exact.nonEmpty)
  }

  test("seeded search: a 4-node router shortlist recovers the neighborhood") {
    val corpus = clustered
    val queries = corpus.where($"vec_id" % 50 === 7)
    val g = GraphAnn.buildGraph(corpus, "vec_id", k = K,
      initBuckets = 16, iterations = 2)
    // a SHORTLIST of scattered same-cluster seeds (the router's
    // deliverable — a single seed is NOT the operating point: the
    // refined kNN graph is cluster-pure but thin, diameter ~n/2k, so
    // one entry needs ~diameter hops while a scattered handful
    // covers the cluster in 3)
    val seeds = queries.select(col("vec_id").as("q_id"),
      explode(array(col("vec_id") + 1, col("vec_id") + 13,
        col("vec_id") + 26, col("vec_id") + 39)).as("node"))
    val approx = GraphAnn.searchSeeded(g, corpus, queries, "vec_id",
      k = 5, beam = 8, hops = 3, seeds)
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", k = 5)
    val recall = AnnEval.recallAtK(approx, exact, "q_id", "vec_id", k = 5)
      .agg(avg("recall_milli")).head().getDouble(0)
    assert(recall >= 900.0, s"mean recall_milli $recall < 900")
  }

  test("realistic beam search: high recall from a sparse entry set") {
    val corpus = clustered
    val queries = corpus.where($"vec_id" % 50 === 7)
    val g = GraphAnn.buildGraph(corpus, "vec_id", k = K,
      initBuckets = 16, iterations = 2)
    val approx = GraphAnn.searchStrideEntries(g, corpus, queries, "vec_id",
      k = 5, beam = 8, hops = 5, entryStride = 16)
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", k = 5)
    val recall = AnnEval.recallAtK(approx, exact, "q_id", "vec_id", k = 5)
      .agg(avg("recall_milli")).head().getDouble(0)
    // ~12 hash entries over 200 vectors, 5 hops of beam 8: the graph
    // walk must recover the near-exact neighborhood
    assert(recall >= 900.0, s"mean recall_milli $recall < 900")
  }
}
