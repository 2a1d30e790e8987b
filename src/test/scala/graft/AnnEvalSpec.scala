package graft

import graft.ops.AnnEval

class AnnEvalSpec extends SparkSpec {
  import spark.implicits._

  test("recall@k: hits, floor milli, starved queries surface with zero") {
    val exact = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), // q1: 3 exact neighbors
      (2L, 20L), (2L, 21L), (2L, 22L), // q2
      (3L, 30L), (3L, 31L), (3L, 32L)) // q3: absent from approx entirely
      .toDF("q_id", "vec_id")
    val approx = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), // perfect
      (2L, 20L), (2L, 99L), (2L, 98L)) // 1 of 3
      .toDF("q_id", "vec_id")

    val byQ = AnnEval.recallAtK(approx, exact, "q_id", "vec_id", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    assert(byQ(1L) == ((3L, 3L, 1000L)))
    assert(byQ(2L) == ((3L, 1L, 333L))) // floor(1000/3)
    assert(byQ(3L) == ((3L, 0L, 0L)), "starved query must not vanish")
  }

  test("plantedTokenBags: controlled angular distance, planted set IS the exact top-k") {
    import org.apache.spark.sql.functions._
    val (corpus, queries) = AnnEval.plantedTokenBags(spark, dims = 64,
      nBgDocs = 20000L, m = 4, nQueries = 2, nPlanted = 12)

    // the angular CONTRACT: per planted rank j, measured cos(u, q) of
    // matching tokens sits near the nominal 16/sqrt(256+(10+j)^2) —
    // the band (0.85..0.61) where hyperplane LSH actually misses.
    // (Mixture noise contributes ~±0.05 per instance; means over
    // 2 queries x 4 tokens are tighter.)
    val q = graft.ops.Similarity.withQuantized(queries, "embedding")
      .select(col("doc_id").as("q"), col("tok"),
        col("ei").as("qe"), col("nn").as("qn"))
    val planted = corpus.where(col("doc_id") < 1000000)
      .withColumn("q", expr("(doc_id - 100) DIV 12"))
      .withColumn("j", expr("(doc_id - 100) % 12"))
    val cosByJ = graft.ops.Similarity.withQuantized(planted, "embedding")
      .join(q, Seq("q", "tok"))
      .withColumn("cosm", graft.ops.Similarity.cosineMicro(
        graft.ops.Similarity.dotLong(col("ei"), col("qe")),
        col("nn"), col("qn")))
      .groupBy("j").agg(avg(col("cosm")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1) / 1e6).toMap
    (0 until 12).foreach { j =>
      val nominal = 16.0 / math.sqrt(256.0 + (10.0 + j) * (10.0 + j))
      assert(math.abs(cosByJ(j.toLong) - nominal) < 0.05,
        s"j=$j measured ${cosByJ(j.toLong)} vs nominal $nominal")
    }
    // ordering: the mixture's cos decreases with j. Adjacent nominal
    // gaps (~0.02 at the tail) are comparable to the mean's noise at
    // this sample size (8 token pairs per j), so assert at stride 3,
    // where the nominal gap (>= 0.05) dominates.
    assert((0 until 9).forall(j => cosByJ(j.toLong) > cosByJ(j + 3L)),
      s"stride-3 ordering violated: ${(0 until 12).map(j => cosByJ(j.toLong))}")

    // ground truth is the planted set, not background: with 20k
    // independent hash-grid bags the exact top-10 per query must be
    // planted doc_ids only (cos >= ~0.6 vs background max-cos ~0.4)
    val gt = graft.ops.MaxSim.scoreExact(corpus, queries, k = 10)
    assert(gt.count() == 20)
    assert(gt.where(col("doc_id") >= 1000000).count() == 0,
      "background doc in the exact top-10: planted margin too thin")

    // determinism: same parameters, bit-identical fixture
    val (corpus2, _) = AnnEval.plantedTokenBags(spark, dims = 64,
      nBgDocs = 20000L, m = 4, nQueries = 2, nPlanted = 12)
    assert(corpus.exceptAll(corpus2).isEmpty && corpus2.exceptAll(corpus).isEmpty)
  }

  test("planted fixture DISCRIMINATES: recall drops with planes, multi-probe recovers") {
    import org.apache.spark.sql.functions._
    // the property the r11 jittered-replica fixture lacked (every row
    // 1.000): on planted neighbors at cos 0.85..0.61, the pruned
    // path's recall must fall as planes sharpen the buckets and rise
    // again when each query token probes its nearest-boundary
    // neighbors. Everything here is deterministic (hash-grid fixture,
    // md5 planes), so the measured millis are constants for these
    // parameters — the assertions pin the SHAPE with wide margins.
    val (corpus, queries) = AnnEval.plantedTokenBags(spark, dims = 64,
      nBgDocs = 20000L, m = 4, nQueries = 4, nPlanted = 12)
    val c = corpus.localCheckpoint(true)
    val q = queries.localCheckpoint(true)
    val gt = graft.ops.MaxSim.scoreExact(c, q, k = 10).localCheckpoint(true)
    def recall(p: Int, mp: Int): Long =
      AnnEval.recallAtK(
          graft.ops.MaxSim.scoreLshPruned(c, q, k = 10, nPlanes = p,
            dims = 64, multiProbe = mp),
          gt, "q_doc", "doc_id", k = 10)
        .agg(avg(col("recall_milli"))).head().getDouble(0).round
    val r8 = recall(8, 0); val r16 = recall(16, 0); val r16mp4 = recall(16, 4)
    info(s"recall milli: p8=$r8 p16=$r16 p16_mp4=$r16mp4")
    assert(r8 < 1000, "p8 must not saturate — the r11 failure mode")
    assert(r8 >= r16 + 150, s"recall must drop p8->p16 (p8=$r8 p16=$r16)")
    assert(r16mp4 >= r16 + 100,
      s"multi-probe must recover recall at p16 (mp4=$r16mp4 single=$r16)")
  }
}
