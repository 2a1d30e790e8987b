package graft.ops

import org.apache.spark.sql.DataFrame
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
