package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Weighted PageRank as an iterative DataFrame computation — the
  * power-iteration member of the engine's iterative-algorithm family
  * (beside `Dedup.connectedComponents`' min-label propagation).
  *
  * All arithmetic is INTEGER micro-units with a fixed operation
  * order: per-edge contribution = (pr * w) div outw, damped update =
  * base + (dampNum * Σcontrib) div 100. Integer division floors, so
  * every iteration is exactly order-independent — the oracle replays
  * the identical recurrence in SQL and hash-matches, the same
  * exactness contract the dec/micro idiom gives derived floats.
  * (pr <= 1e6 and fixture weights keep pr*w far below 2^63.)
  *
  * Scale shape: one equi-join edges⋈ranks plus one aggregation per
  * iteration — both shuffle on the SAME key (src/dst node id), so at
  * 1000 executors each round is two hash exchanges of the edge list,
  * no driver materialization of anything but the node count.
  * `localCheckpoint` truncates lineage each round (the
  * connectedComponents discipline) so plan depth stays O(1) instead
  * of O(iterations). Dangling nodes (no out-edges) simply leak their
  * mass — the variant is deterministic and documented, matching the
  * oracle.
  */
object PageRank {

  /** Run `iters` damped power iterations over weighted `edges`
    * (columns: src, dst, w — long weights). Returns (node, pr_micro).
    */
  def run(edges: DataFrame, iters: Int, dampNum: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters in [1,64] (got $iters)")
    require(dampNum >= 0 && dampNum <= 100, s"dampNum in [0,100] (got $dampNum)")
    val e = edges.select(col("src"), col("dst"), col("w").cast(LongType))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist()
    try {
      val n = nodes.count()
      require(n > 0, "empty graph")
      val base = ((100L - dampNum) * 1000000L / 100L) / n // exact: all longs
      val outw = e.groupBy(col("src").as("node"))
        .agg(sum("w").as("outw"))
      // persisted pre-partitioned on the per-round join key (the
      // LabelPropagation discipline, r15): every iteration's
      // ew⋈ranks reuses the cached hash partitioning, so the edge
      // list is exchanged once at build instead of once per round
      val ew = e.join(outw, col("src") === outw("node"))
        .select(col("src"), col("dst"), col("w"), col("outw"))
        .repartition(col("src"))
        .persist()
      try {
        var ranks = nodes.select(col("node"),
          lit(1000000L / n).as("pr"))
        for (_ <- 1 to iters) {
          val contrib = ew.join(ranks, ew("src") === ranks("node"))
            .select(col("dst"),
              expr("(pr * w) div outw").as("c"))
            .groupBy("dst").agg(sum("c").as("s"))
          ranks = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
            .select(nodes("node"),
              (lit(base) + expr(s"($dampNum * coalesce(s, 0L)) div 100"))
                .cast(LongType).as("pr"))
            .localCheckpoint() // truncate lineage: O(1) plan depth
        }
        ranks
      } finally { ew.unpersist(); () }
    } finally { nodes.unpersist(); () }
  }

  /** The identical recurrence as DuckDB SQL (for oracle parity):
    * unrolled iteration CTEs r1..r`iters` over caller-provided
    * `edges`/`nodes`/`outw` CTE names, since SQL forbids aggregation
    * inside a recursive term. `//` is DuckDB's floor division — the
    * same operator semantics as Spark's `div` on the all-positive
    * values here.
    */
  def recurrenceSql(iters: Int, dampNum: Int = 85): String = {
    val base = s"(SELECT (${100 - dampNum} * 1000000 // 100) // COUNT(*) FROM nodes)"
    val r0 =
      s"r0 AS (SELECT node, CAST(1000000 // (SELECT COUNT(*) FROM nodes) AS BIGINT) AS pr FROM nodes)"
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT n.node,
           CAST($base + ($dampNum * COALESCE(s.s, 0)) // 100 AS BIGINT) AS pr
         FROM nodes n LEFT JOIN (
           SELECT e.dst AS node, SUM((r.pr * e.w) // o.outw) AS s
           FROM edges e
             JOIN r${i - 1} r ON r.node = e.src
             JOIN outw o ON o.node = e.src
           GROUP BY e.dst) s ON s.node = n.node)"""
    }
    (r0 +: steps).mkString(",\n")
  }
}
