package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Pins the CorpusClean scan budget: the round-1 plan re-derived the
  * `quality`/`unique` subtrees per consumer (48 source scans, 22
  * exchanges at q60). With both stages persisted, one run scans the
  * source at most once per union branch of the input (q60 unions the
  * documents table 3 ways) and never re-runs a dedup shuffle.
  */
class CorpusCleanPlanSpec extends SparkSpec {

  /** Counts file source scans a single execution actually performs:
    * each cached relation's build plan is counted once (identity-dedup),
    * reused exchanges are free, AQE stage wrappers are descended.
    */
  private def countSourceScans(plan: SparkPlan,
      seen: java.util.IdentityHashMap[AnyRef, Boolean]): Int = {
    val self = plan match {
      case a: AdaptiveSparkPlanExec => countSourceScans(a.executedPlan, seen)
      case q: QueryStageExec        => countSourceScans(q.plan, seen)
      case _: ReusedExchangeExec    => 0
      case _: FileSourceScanExec    => 1
      case c: InMemoryTableScanExec =>
        // the same cache entry surfaces as distinct InMemoryRelation
        // copies; the shared CachedRDDBuilder identifies the entry
        if (seen.containsKey(c.relation.cacheBuilder)) 0
        else {
          seen.put(c.relation.cacheBuilder, true)
          countSourceScans(c.relation.cachedPlan, seen)
        }
      case _ => 0
    }
    self + plan.children.map(countSourceScans(_, seen)).sum
  }

  test("transitive mode keeps exactly one document per duplicate cluster") {
    import spark.implicits._
    // A~C and B~C are near-dups (C truncated copies), A and B are the
    // same doc under different ids: pair-greedy keeps A and B; the
    // transitive mode must keep only the min id A
    val base = ("common tokens shared by every variant of this document " * 3).trim
    val docs = Seq(
      (1L, base + " alpha"),
      (2L, base + " alpha"),  // exact dup of 1 (removed by exact stage)
      (5L, base)              // truncated near-dup of both
    ).toDF("doc_id", "text")
    val params = graft.pipeline.CorpusClean.Params(minTokens = 3,
      transitive = true)
    val kept = graft.pipeline.CorpusClean.clean(docs, params)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L), s"kept $kept")
    spark.catalog.clearCache()
  }

  test("q60 corpus-clean scans the source at most 3 times per run") {
    val df = graft.SparkEntry.queries("q60_corpus_clean")(spark, "/root/testdata/sf0.001")
    assert(df.count() > 0) // materialize (populates caches, finalizes AQE)
    val scans = countSourceScans(df.queryExecution.executedPlan,
      new java.util.IdentityHashMap[AnyRef, Boolean])
    assert(scans <= 3, s"expected <=3 source scans, got $scans:\n" +
      df.queryExecution.executedPlan.toString.take(4000))
    spark.catalog.clearCache()
  }
}
