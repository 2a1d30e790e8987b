package graft

/** Permanent plan audit over EVERY SparkEntry query: the operators
  * that must never appear silently — CartesianProduct (an unintended
  * cross join is a scale-killer) and SortAggregate (a string-keyed or
  * non-mutable aggregate buffer fell out of HashAggregate; see the
  * MinHash long-buffer rationale). BroadcastNestedLoopJoin is allowed
  * only where it is the intended plan (brute-force scoring against a
  * broadcast-size side, scalar-count cross joins).
  *
  * Catches regressions the per-op specs can't: a refactor that turns
  * a broadcast join into a cartesian, or an aggregate falling back to
  * sort-based, shows up here before it shows up at 100 TB.
  */
class PlanAuditSpec extends SparkSpec {

  private val bnljAllowed = Set(
    "q09_join_nonequi_bands",  // non-equi vs broadcast dimension
    "q48_ann_bruteforce",      // corpus x 5 broadcast query vectors
    "q138_ann_recall",         // embeds q48's ground-truth brute force
    "q108_pq_adc",             // PQ codes x 5 broadcast query LUTs (q48 shape)
    "q50_embed_neardup",       // sampled quadratic stage (by design)
    "q78_tfidf_topk",          // single-row n_docs scalar cross join
    "q91_unigram_nll",         // single-row n_total scalar cross join
    "q96_quality_gate",        // single-row n_total scalar cross join (q91 shape)
    "q98_mixture_resample",    // single-row n_total scalar cross join (q91 shape)
    "q114_fuzzy_vocab",        // bounded short-string stratum, both sides broadcast
    "q115_bm25",               // single-row corpus-stats scalar cross join
    "q135_bm25_index",         // single-row corpus-stats scalar cross join (q115 shape)
    "q117_hll_rollup",         // single-row sketch-union x exact-count scalar join
    "q124_volume_anomaly",     // single-row corpus-moments scalar cross join
    "q139_leakage_safe_split", // single-row leak-count scalar cross join
    "q129_pmi_pairs",          // single-row n_docs scalar cross join (q91 shape)
    "q145_token_mixture",      // single-row w_total scalar cross join (q98 shape)
    "q151_passage_bm25",       // single-row corpus-stats scalar cross join (q115 shape)
    "q157_embedding_drift",    // single-row snapshot-totals scalar cross join
    "q158_bigram_nll",         // single-row n_total scalar cross join (q91 shape)
    "q175_maxsim_exact",       // corpus tokens x broadcast query-token bag (q48 shape)
    "q179_hard_negatives",     // q48 shape + label-inequality scan filter
    "q176_maxsim_lsh",         // same broadcast re-rank tail over the LSH shortlist
    "q180_maxsim_index",       // same broadcast re-rank tail over the stored shortlist
    "q186_maxsim_multiprobe",  // same broadcast re-rank tail over the expanded shortlist
    "q182_ols_quality_probe")  // single-row coefficient-frame scalar cross join

  test("no query plans a CartesianProduct or SortAggregate; BNLJ only where intended") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val bad = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "SortAggregate" -> plan.contains("SortAggregate"),
        "BroadcastNestedLoopJoin" ->
          (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name)))
      bad.collect { case (op, true) => s"$name: $op" }
    }
    assert(offenders.isEmpty, s"plan audit failures:\n${offenders.mkString("\n")}")
    spark.catalog.clearCache() // q60's corpus-clean persists its stages
  }

  test("scale-critical dedup/index plan shapes are pinned (broadcast hints, static prune)") {
    // With auto-broadcast OFF, a BroadcastHashJoin can only come from
    // an explicit broadcast() hint — so these asserts go red the
    // moment a refactor drops the hints the scaladocs promise, instead
    // of the regression surfacing as a full-corpus shuffle at scale.
    val dir = "/root/testdata/sf0.001"
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // q103/q106: exact-Jaccard verification must broadcast the
      // (contract: LSH-bounded) pair side on both joins
      Seq("q103_verified_neardup_pairs", "q106_neardup_quarantine")
        .foreach { name =>
          val plan = SparkEntry.queries(name)(spark, dir)
            .queryExecution.executedPlan.toString
          assert(plan.contains("BroadcastHashJoin"),
            s"$name lost its broadcast pair-side verification joins")
          assert(!plan.contains("CartesianProduct"), name)
        }

      // q77's pair lineage (shared with q103/q106): bucket-local pair
      // explosion is JOIN-FREE — nothing that could degrade into an
      // all-pairs product. (The size-adaptive component resolution on
      // top is contract-tested in DedupSpec: both paths, same labels.)
      val sig = graft.ops.Dedup.minhashSignatures(
        Tables(spark, dir, "documents").select("doc_id", "text"),
        "doc_id", "text", k = 8, shingleWidth = 3)
      val pairsPlan = graft.ops.Dedup
        .lshCandidatePairs(sig, "doc_id", bands = 4, rowsPerBand = 2)
        .queryExecution.executedPlan.toString
      assert(!pairsPlan.contains("Join") && !pairsPlan.contains("CartesianProduct"),
        s"LSH candidate pairs grew a join:\n$pairsPlan")

      // q110: the probe must carry a STATIC cell partition filter
      // (guaranteed pruning) and hint-broadcast both the query side
      // and the shortlist re-rank side
      val plan110 = SparkEntry.queries("q110_ivfpq_index")(spark, dir)
        .queryExecution.executedPlan.toString
      val scanLines = plan110.split("\n").filter(_.contains("PartitionFilters"))
      assert(scanLines.exists(l => l.contains("cell") &&
        (l.contains(" IN ") || l.contains("INSET"))),
        s"q110 lost its static cell prune:\n${scanLines.mkString("\n")}")
      assert(plan110.contains("BroadcastHashJoin"),
        "q110 lost its hinted broadcast probe/re-rank joins")
      assert(!plan110.contains("CartesianProduct"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("driver contract: every query has an oracle and vice versa") {
    // a query without an oracle silently downgrades to a rows-only
    // check in the driver's gate; this pins the 1:1 contract forever
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing oracles: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles missing queries: ${(o -- q).toSeq.sorted}")
  }

  test("README and COVERAGE query counts track SparkEntry (no doc drift)") {
    // the docs are the shop window; a stale count there survived three
    // rounds of manual updates, so the count is now pinned to the one
    // source of truth — this test fails the build on drift
    val n = SparkEntry.queries.size
    def firstInt(path: String, pattern: scala.util.matching.Regex): Int = {
      val src = scala.io.Source.fromFile(path, "UTF-8")
      val text = try src.mkString finally src.close()
      pattern.findFirstMatchIn(text)
        .getOrElse(fail(s"$path: no match for $pattern")).group(1).toInt
    }
    val readme = firstInt("README.md", """(\d+) named queries""".r)
    assert(readme == n, s"README.md says $readme named queries, registry has $n")
    val coverage = firstInt("COVERAGE.md", """(\d+) queries total""".r)
    assert(coverage == n, s"COVERAGE.md says $coverage queries total, registry has $n")
  }
}
