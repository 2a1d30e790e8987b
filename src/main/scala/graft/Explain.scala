package graft

/** Plan auditor: prints `explain("formatted")` for the named queries
  * (or a default set of representative ones) so pushdown, broadcast,
  * partial aggregation, and whole-stage-codegen coverage can be
  * checked per query.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q02_filter_predicates", "q03_join_dims",
        "q04_topk_orders", "q48_ann_bruteforce", "q45_minhash_pairs",
        "q60_corpus_clean", "q61_ann_ivf", "q77_neardup_clusters",
        "q78_tfidf_topk", "q81_funnel_pairs", "q86_contamination",
        "q90_segment_dedup", "q93_semantic_dedup")
    val spark = GraftSession.local()
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
