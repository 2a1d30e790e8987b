package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN quality evaluation: recall@k of an approximate result set
  * against exact ground truth — the measurement loop every ANN
  * deployment runs when tuning nProbe/nLists/PQ budgets (recall is
  * THE dial those parameters trade throughput against, and an
  * unmeasured index silently decays as the corpus drifts).
  *
  * Pure frame algebra over the two result sets: one equi-join on
  * (query, neighbor) and one aggregation keyed by query — evaluating
  * a million-query probe costs one shuffle of two k·|queries|-row
  * frames, nothing touches the driver. Exact-integer milli recall
  * (q-family rounding convention) so the evaluation itself is
  * oracle-replayable.
  */
object AnnEval {

  /** Recall FIXTURE with planted neighbors at CONTROLLED ANGULAR
    * distance — the property a recall instrument needs to
    * discriminate. Jittered-replica fixtures (corpus = noisy copies
    * of the query) sit at cos θ ≈ 1 − ε, which hyperplane LSH
    * collides with near-certainty at any plane count: every recall
    * row reads 1.000 and the instrument can't justify a parameter
    * default or catch a regression.
    *
    * Here each query doc gets `nPlanted` true neighbors built as an
    * explicit mixture u = (16·q + (10+j)·n) / 26 per token, where q
    * is the query token and n an independent hash-grid direction
    * (E[q·n] = 0 in 64-dim, spread ~1/√dims). Nominal
    * cos(u, q) = 16 / √(256 + (10+j)²): j = 0 → 0.848 down to
    * j = 11 → 0.606 — the angular band where per-plane collision
    * probability (1 − θ/π ≈ 0.75–0.82) compounds to a REAL miss rate
    * at 8–16 planes, so single-probe recall measurably drops with
    * plane count and multi-probe measurably recovers it. Background
    * docs are independent hash-grid bags (cos ≈ 0 ± 1/√dims to
    * everything), so the exact top-k per query is the planted set.
    *
    * All components are deterministic xxhash64 grid points at 1e-3
    * resolution — no RNG state, exact under 1e-6 quantization, and
    * the fixture replays bit-identically anywhere.
    *
    * Returns (corpus, queries): token bags shaped
    * (doc_id, tok, vec_id, embedding) — [[MaxSim]]'s multi-vector
    * layout. Background doc_ids start at 1,000,000; planted at
    * 100 + q·nPlanted + j; queries are their own frame with doc_ids
    * 0..nQueries−1 (disjoint from the corpus, so self-exclusion in
    * the scorer never bites).
    */
  def plantedTokenBags(spark: SparkSession, dims: Int, nBgDocs: Long, m: Int,
                       nQueries: Int, nPlanted: Int): (DataFrame, DataFrame) = {
    require(nQueries * nPlanted < 999900, "planted ids must stay below bg ids")
    // query doc_ids are 0..nQueries-1 and planted doc_ids start at
    // 100: past 100 queries they would collide and the scorer's
    // doc_id =!= q_doc self-exclusion would silently DROP planted
    // docs from their own query's candidates, corrupting ground truth
    require(nQueries <= 100, "query doc_ids must stay below planted base 100")
    require(nBgDocs * m < 1000000000L,
      "bg vec_ids (4e9 + id) must stay below the query vec_id range at 5e9")
    // uniform grid point in [-1, 1] from a salted hash of (key, dim)
    def unit(salt: String, key: String): String =
      s"(pmod(xxhash64('$salt', $key, i), 2001) - 1000) / 1000.0"
    def grid(body: String): String =
      s"transform(sequence(0, ${dims - 1}), i -> CAST($body AS FLOAT))" +
        s" AS embedding"
    val bg = spark.range(nBgDocs * m).selectExpr(
      s"id DIV $m + 1000000 AS doc_id",
      s"id % $m AS tok",
      "id + 4000000000 AS vec_id",
      grid(unit("annbg", "id")))
    val queries = spark.range(nQueries.toLong * m).selectExpr(
      s"id DIV $m AS doc_id",
      s"id % $m AS tok",
      "id + 5000000000 AS vec_id",
      grid(unit("annq", "id")))
    val planted = spark.range(nQueries.toLong * nPlanted * m)
      .selectExpr(
        s"id DIV ${nPlanted * m} AS q",
        s"(id DIV $m) % $nPlanted AS j",
        s"id % $m AS tok",
        "id AS nid")
      .selectExpr(
        s"100 + q * $nPlanted + j AS doc_id",
        "tok",
        "nid + 6000000000 AS vec_id",
        grid(s"(16.0 * (${unit("annq", s"q * $m + tok")})" +
          s" + (10.0 + j) * (${unit("annn", "nid")})) / 26.0"))
    (bg.unionByName(planted), queries)
  }

  /** Per-query recall@k: `n_hits` = |approx ∩ exact|, `recall_milli`
    * = n_hits·1000 div k. Both inputs carry (qCol, idCol) rows — at
    * most k per query, as produced by the engine's search operators.
    * Queries present in `exact` but absent from `approx` (an
    * over-selective filter, a starved probe) surface with zero hits
    * rather than vanishing.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame,
                qCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k >= 1 (got $k)")
    exact.select(col(qCol), col(idCol))
      .join(approx.select(col(qCol), col(idCol)).withColumn("hit__", lit(1L)),
        Seq(qCol, idCol), "left")
      .groupBy(qCol)
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit__"), lit(0L))).as("n_hits"))
      .withColumn("recall_milli", expr(s"n_hits * 1000 DIV $k"))
  }
}
