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
  * Scale shape (re-measured round 15): the adjacency is persisted
  * ALREADY HASH-PARTITIONED on the join key (`repartition(v)` before
  * `persist`), so the per-round adj⋈labels equi-join reuses the
  * cached partitioning and only the (node-sized) labels frame is
  * exchanged per round — the edge list, the big side, crosses the
  * network ONCE at build instead of once per round (guide §2.4:
  * operations keyed the same way share one exchange). The per-node
  * argmax is the neighbor-label count aggregation (map-side combined
  * HashAggregate — the count frame, not the edge list, is what the
  * argmax consumes) followed by ONE row_number window ordered by
  * (count desc, label asc) — replacing the r10-r14 two-step
  * max-count/filter/min-label shape, which cost three exchanges and
  * a persist of the counts frame per round where the window costs
  * one exchange and no persist (r15 plan audit: 5 exchanges/round →
  * 3, the cached adjacency's per-round Exchange gone — see
  * plans/r15/q133_* and OPTIMIZATION_r15.md for the measured walls;
  * identical labels, oracle-verified at sf0.01 and sf0.1). The
  * window is a WindowGroupLimit top-1 per node over (count, label)
  * pairs — bounded by the node's distinct neighbor labels, never a
  * per-node edge list.
  * `localCheckpoint` per round keeps plan depth O(1). Nothing ever
  * reaches the driver.
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
    // persisted pre-partitioned on the per-round join key: every
    // round's adj⋈labels reuses this cached exchange, so the edge
    // list is shuffled once at build, not once per round
    val adj = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .distinct().repartition(col("v")).persist()
    try {
      var labels = adj.select(col("u").as("node")).distinct()
        .select(col("node"), col("node").as("lbl"))
      val byNode = org.apache.spark.sql.expressions.Window
        .partitionBy("u").orderBy(col("c").desc, col("nl"))
      for (_ <- 1 to iters) {
        val nbrCounts = adj.join(labels, adj("v") === labels("node"))
          .select(col("u"), col("lbl").as("nl"))
          .groupBy("u", "nl").agg(count(lit(1)).as("c"))
        // argmax: highest count, ties -> smallest label. (u, nl) rows
        // are distinct, so the (c desc, nl asc) order is total and the
        // row_number pick is deterministic — the oracle replays the
        // identical window.
        labels = nbrCounts
          .withColumn("rn", row_number().over(byNode))
          .where(col("rn") === 1)
          .select(col("u").as("node"), col("nl").cast(LongType).as("lbl"))
          .localCheckpoint() // truncate lineage: O(1) plan depth
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
