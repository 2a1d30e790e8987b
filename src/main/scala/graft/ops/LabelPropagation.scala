package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Community detection by SYNCHRONOUS label propagation (LPA,
  * Raghavan et al. 2007) — the third member of the iterative-graph
  * family beside [[Dedup.connectedComponents]] (min-label) and
  * [[PageRank]] (power iteration). Connected components answer "what
  * is reachable"; LPA answers the finer "what is densely knit" —
  * near-duplicate *neighborhoods*, co-purchase clusters, topical
  * groups — without a modularity solver.
  *
  * Determinism contract (the whole point of this variant): the
  * classic algorithm breaks frequency ties randomly and updates
  * asynchronously — irreproducible at cluster scale. Here every
  * round is synchronous and the update rule is total-ordered: new
  * label = the neighbor label with the highest count, ties broken by
  * SMALLEST label. A fixed iteration count rather than a convergence
  * test keeps the plan static (synchronous LPA can 2-cycle on
  * bipartite structure; a fixed-round snapshot is deterministic
  * either way and the oracle replays it bit-for-bit).
  *
  * Scale shape: per round ONE equi-join adj⋈labels (both sides keyed
  * by node id) and the per-node argmax as a TWO-STEP aggregation —
  * max count per node, filter the count frame to its max, min label —
  * rather than a window (no per-node label lists) or a struct-max
  * (whose immutable buffer demotes the whole aggregate to
  * SortAggregate; these are all primitive-buffer HashAggregates,
  * map-side combined). The counts frame is persisted for the round so
  * the two consumers share one computation. `localCheckpoint` per
  * round keeps plan depth O(1). Nothing ever reaches the driver.
  */
object LabelPropagation {

  /** Run `iters` synchronous rounds over undirected `edges`
    * (columns `src`, `dst`; duplicates and direction are normalized
    * away, self-loops dropped). Every edge endpoint gets a community
    * label; returns (node, community).
    */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters in [1,64] (got $iters)")
    val e = edges.select(col("src").cast(LongType).as("u"),
        col("dst").cast(LongType).as("v"))
      .where(col("u") =!= col("v"))
    val adj = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .distinct().persist()
    try {
      var labels = adj.select(col("u").as("node")).distinct()
        .select(col("node"), col("node").as("lbl"))
      for (_ <- 1 to iters) {
        val nbrCounts = adj.join(labels, adj("v") === labels("node"))
          .select(col("u"), col("lbl").as("nl"))
          .groupBy("u", "nl").agg(count(lit(1)).as("c"))
          .persist()
        val mc = nbrCounts.groupBy("u").agg(max("c").as("mc"))
        labels = nbrCounts.join(mc, "u")
          .where(col("c") === col("mc"))
          .groupBy("u").agg(min("nl").cast(LongType).as("lbl"))
          .select(col("u").as("node"), col("lbl"))
          .localCheckpoint() // truncate lineage: O(1) plan depth
        nbrCounts.unpersist()
      }
      labels.select(col("node"), col("lbl").as("community"))
    } finally { adj.unpersist(); () }
  }

  /** The identical recurrence as DuckDB SQL: unrolled round CTEs
    * l0..l`iters` over a caller-provided symmetric `adj(u, v)` CTE
    * (both directions present, no self-loops, distinct). The SQL
    * argmax (ROW_NUMBER ordered by count DESC, label ASC) is exactly
    * the Spark side's `max(struct(c, -label))`.
    */
  def recurrenceSql(iters: Int): String = {
    val l0 = "l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM adj)"
    val steps = (1 to iters).map { i =>
      s"""l$i AS (SELECT node, lbl FROM (
           SELECT a.u AS node, l.lbl, COUNT(*) AS c,
             ROW_NUMBER() OVER (PARTITION BY a.u
               ORDER BY COUNT(*) DESC, l.lbl) AS rn
           FROM adj a JOIN l${i - 1} l ON l.node = a.v
           GROUP BY a.u, l.lbl) WHERE rn = 1)"""
    }
    (l0 +: steps).mkString(",\n")
  }
}
