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
    *
    * `twoPass` (default, the [[Contamination.gramDocFrequency]]
    * discipline): pass 1 counts per-doc-distinct gram HASHES — the
    * corpus-wide shuffle carries 8-byte longs, combined map-side,
    * instead of n-word strings — and blooms the `minDf` survivors;
    * pass 2 materializes (pos, gram) ONLY for windows whose hash
    * survived ([[graft.functions.SurvivingGrams.survivingGramPositions]],
    * one 64-bit probe per pruned window), then an exact string df over
    * that thinned stream re-verifies before masking. Hash collisions
    * and bloom false positives can only ADMIT extra candidates to the
    * exact pass — never change its verdict — so the output is
    * bit-identical to the single-pass string formulation (and to the
    * relational oracle), while the wide shuffles carry the duplicated
    * SLICE of the corpus, not the corpus.
    */
  def dupSpanStats(docs: DataFrame, idCol: String, tokensSql: String,
                   n: Int, minDf: Int = 2,
                   twoPass: Boolean = true): DataFrame = {
    require(n >= 2, s"span gram width must be >= 2 (got $n)")
    require(minDf >= 2, s"minDf < 2 would mask every position (got $minDf)")
    val d = docs.select(col(idCol), expr(tokensSql).as("tk"))
      .withColumn("n_tokens", expr("size(tk)").cast(LongType))
    val toks = d.where(col("n_tokens") >= n)

    // duplicated anchor positions, one row per (doc, pos)
    val anchors: DataFrame =
      if (!twoPass) {
        val occ = toks
          .select(col(idCol), posexplode(expr(
            s"transform(sequence(1, size(tk) - ${n - 1})," +
              s" i -> concat_ws(' ', slice(tk, i, $n)))")).as(Seq("p0", "gram")))
          .select(col(idCol), (col("p0") + 1).as("pos"), col("gram"))
        val freq = occ.groupBy("gram")
          .agg(countDistinct(col(idCol)).as("df"))
          .where(col("df") >= minDf)
        occ.join(freq.select("gram"), Seq("gram")).select(col(idCol), col("pos"))
      } else {
        val spark = docs.sparkSession
        // pass 1: long-keyed df over per-doc-distinct window hashes
        val survivors = toks
          .select(explode(array_distinct(
            graft.functions.GramHashes.gramHashArray(col("tk"), n))).as("gh"))
          .groupBy("gh").agg(count(lit(1)).as("df"))
          .where(col("df") >= minDf)
          .select("gh")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nSurv = survivors.count()
        val bloom =
          if (nSurv == 0L)
            org.apache.spark.util.sketch.BloomFilter.create(1L, 0.001)
          else survivors.stat.bloomFilter("gh", nSurv, 0.001)
        survivors.unpersist()
        val bc = spark.sparkContext.broadcast(bloom)
        // pass 2: candidate (pos, gram) built in-row for survivors
        // only; exact string df re-verifies (a true-df>=minDf gram's
        // occurrences ALL pass the bloom, so its exact count is
        // complete on the candidate stream)
        val cand = toks
          .select(col(idCol), explode(
            graft.functions.SurvivingGrams
              .survivingGramPositions(col("tk"), n, bc)).as("pg"))
          .select(col(idCol), col("pg.pos").as("pos"), col("pg.sh").as("gram"))
        val verified = cand.groupBy("gram")
          .agg(countDistinct(col(idCol)).as("df"))
          .where(col("df") >= minDf)
        cand.join(verified.select("gram"), Seq("gram"))
          .select(col(idCol), col("pos"))
      }

    // one row per duplicated anchor (pos is unique per doc; a gram
    // matches at most one freq row, so the join cannot duplicate) →
    // sorted anchor array per doc → merged-interval length in one
    // fold: each anchor contributes min(n, gap-to-previous), the
    // first a full n
    val masked = anchors
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
