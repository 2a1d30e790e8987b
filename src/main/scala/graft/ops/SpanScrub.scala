package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Cross-document duplicated-span accounting — the measurement half
  * of exact-substring train-set dedup (the "remove any 50-token span
  * that appears verbatim elsewhere" pass; cf. the reference's row
  * dedup at `utils/dataframe_operations.py`, which stops at whole-row
  * equality): a token position is DUPLICATED if any n-gram covering
  * it occurs in at least `minDf` distinct documents IN TOTAL — the
  * host document counts toward the threshold, so the default
  * `minDf = 2` means "at least one OTHER document also has it".
  * Within-document repetition alone does not mask (that is a quality
  * signal, `QualitySignals.repetitionMetrics`); the target here is
  * boilerplate and verbatim cross-doc copies that survive doc-level
  * near-dup because the host documents differ.
  *
  * Plan shape, all linear in token count:
  *  1. per-row n-gram explode (narrow) → one map-side-combined
  *     groupBy(gram) for distinct-doc frequency;
  *  2. hash join occurrences back to the frequent grams (big-big on
  *     gram — both sides shuffle-partitioned by the same key, no
  *     broadcast needed and no skew beyond the gram distribution
  *     itself, which the df >= minDf filter thins first);
  *  3. per-doc interval coalescing: the duplicated ANCHOR positions
  *     (×1, not ×n) group by doc, sort in-row, and one `aggregate`
  *     HOF sums the merged [pos, pos+n-1] run lengths — the earlier
  *     covered-position explode+distinct multiplied the duplicated
  *     stream ×n before its shuffle (57.7s for 500k docs at 20×);
  *     coalescing in-row cuts that shuffle to the anchor count.
  * No quadratic stage, nothing on the driver; at 100 TB the gram-df
  * aggregation is the dominant shuffle and combines map-side. The
  * only per-doc state is the anchor array, bounded by the doc's own
  * token count — the same per-doc bound every text op here carries.
  */
object SpanScrub {

  /** Per-document span-duplication stats: total tokens, masked
    * (duplicated-span-covered) positions, kept positions, and the
    * masked fraction in exact milli units. `tokensSql` is a SQL
    * expression producing the token array from each row (shared with
    * the other text ops so every pass sees one tokenization).
    */
  def dupSpanStats(docs: DataFrame, idCol: String, tokensSql: String,
                   n: Int, minDf: Int = 2): DataFrame = {
    require(n >= 2, s"span gram width must be >= 2 (got $n)")
    require(minDf >= 2, s"minDf < 2 would mask every position (got $minDf)")
    val d = docs.select(col(idCol), expr(tokensSql).as("tk"))
      .withColumn("n_tokens", expr("size(tk)").cast(LongType))
    val occ = d.where(col("n_tokens") >= n)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(1, size(tk) - ${n - 1})," +
          s" i -> concat_ws(' ', slice(tk, i, $n)))")).as(Seq("p0", "gram")))
      .select(col(idCol), (col("p0") + 1).as("pos"), col("gram"))
    val freq = occ.groupBy("gram")
      .agg(countDistinct(col(idCol)).as("df"))
      .where(col("df") >= minDf)
    // one row per duplicated anchor (pos is unique per doc; freq has
    // one row per gram, so the join cannot duplicate) → sorted anchor
    // array per doc → merged-interval length in one fold: each anchor
    // contributes min(n, gap-to-previous), the first a full n
    val masked = occ.join(freq, Seq("gram"))
      .groupBy(idCol)
      .agg(sort_array(collect_list(col("pos"))).as("anchors"))
      .select(col(idCol), expr(
        s"""aggregate(anchors,
           |  named_struct('s', cast(0 as bigint), 'prev', cast(null as bigint)),
           |  (acc, p) -> named_struct(
           |    's', acc.s + least(cast($n as bigint),
           |                       p - coalesce(acc.prev, p - $n)),
           |    'prev', cast(p as bigint)),
           |  acc -> acc.s)""".stripMargin).as("n_masked"))
    d.select(col(idCol), col("n_tokens"))
      .join(masked, Seq(idCol), "left")
      .na.fill(0L, Seq("n_masked"))
      .withColumn("n_kept", col("n_tokens") - col("n_masked"))
      .withColumn("masked_milli", expr("n_masked * 1000 DIV n_tokens"))
  }
}
