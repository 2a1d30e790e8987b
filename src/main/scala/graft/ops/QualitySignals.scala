package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repetition-based document quality signals (the Gopher-rules family):
  * what fraction of a document's n-grams are repeats, and how dominant
  * is its single most frequent n-gram. Boilerplate, keyword-stuffed,
  * and templated pages score high on both and are standard pretraining
  * filter targets.
  *
  * Implementation is deliberately NARROW: the n-gram multiset of one
  * document never leaves its row. Grams are sorted per-row and a
  * single `aggregate` HOF run-length-scans the sorted array for the
  * top gram — zero shuffles, zero row explosion, fully codegen-
  * compatible. At 100 TB this is a map over the corpus scan, where an
  * explode + groupBy(doc, gram) formulation would shuffle the entire
  * token volume twice. Cost is O(L log L) per document (the sort).
  *
  * Ratios are integer milli units (exact, engine-independent); the
  * top gram on ties is the lexicographically smallest (first max run
  * in the ascending-sorted array), so results are deterministic.
  */
object QualitySignals {

  /** Per-document repetition metrics over `n`-word shingles.
    * Output: idCol, n_grams, n_distinct, top_gram, top_c,
    * dup_gram_milli (= repeated-gram fraction), top_gram_milli
    * (= share of the most frequent gram). Documents with fewer than
    * `n` tokens are excluded (no gram exists).
    */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String,
                        n: Int): DataFrame = {
    val grams = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("tk"))
      .where(size(col("tk")) >= n)
      .select(col(idCol), expr(s"array_sort(${Dedup.shingleExpr(n)})").as("gs"))
    // run-length scan of the sorted gram array: acc = (prev gram,
    // current run, best run, best gram); strict > keeps the FIRST
    // (= smallest) gram among ties
    val topScan =
      """aggregate(gs,
        |  named_struct('prev', cast(null as string),
        |               'run', cast(0 as bigint),
        |               'best', cast(0 as bigint),
        |               'bg', cast(null as string)),
        |  (acc, x) -> named_struct(
        |    'prev', x,
        |    'run', IF(x = acc.prev, acc.run + 1, cast(1 as bigint)),
        |    'best', IF(IF(x = acc.prev, acc.run + 1, cast(1 as bigint)) > acc.best,
        |               IF(x = acc.prev, acc.run + 1, cast(1 as bigint)), acc.best),
        |    'bg', IF(IF(x = acc.prev, acc.run + 1, cast(1 as bigint)) > acc.best,
        |             x, acc.bg)),
        |  acc -> named_struct('top_c', acc.best, 'top_gram', acc.bg))""".stripMargin
    grams
      .withColumn("n_grams", size(col("gs")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("gs"))).cast("long"))
      .withColumn("_t", expr(topScan))
      .select(col(idCol), col("n_grams"), col("n_distinct"),
        col("_t.top_gram").as("top_gram"), col("_t.top_c").as("top_c"),
        expr("(n_grams - n_distinct) * 1000 DIV n_grams").as("dup_gram_milli"),
        expr("_t.top_c * 1000 DIV n_grams").as("top_gram_milli"))
  }

  /** Per-document LEXICAL ENTROPY: the Shannon entropy of the
    * document's unigram distribution, in micro-nats per token — the
    * information-theoretic quality signal (machine-generated spam and
    * template pages have low entropy; natural prose sits in a narrow
    * band). Complements [[repetitionMetrics]]: repetition catches
    * verbatim n-gram copying, entropy catches skewed vocabularies
    * with no literal repeats.
    *
    * Same narrow shape as [[repetitionMetrics]]: tokens are sorted
    * per-row and ONE `aggregate` HOF run-length-scans the sorted
    * array, emitting each distinct token's term
    * `round(c * ln(n/c) * 1e6)` as an exact integer — the q91 NLL
    * rounding convention, so the per-doc sum is order-independent and
    * replays bit-for-bit in any engine. Zero shuffles, zero row
    * explosion; at 100 TB this is a map inside the corpus scan where
    * the explode + groupBy(doc, token) formulation would shuffle the
    * full token volume.
    *
    * Output: idCol, n_tokens, n_distinct, ttr_milli (type-token
    * ratio), entropy_micro_per_tok (= sum(term) DIV n). Empty docs
    * (no tokens) are excluded.
    */
  def lexicalEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // run-length scan of the sorted token array; on each run boundary
    // (and once at finish) add the closed run's micro-nat term
    val entScan =
      """aggregate(st,
        |  named_struct('prev', cast(null as string),
        |               'run', cast(0 as bigint),
        |               'acc', cast(0 as bigint)),
        |  (acc, x) -> IF(x = acc.prev,
        |    named_struct('prev', x, 'run', acc.run + 1, 'acc', acc.acc),
        |    named_struct('prev', x, 'run', cast(1 as bigint),
        |      'acc', acc.acc + IF(acc.run = 0, cast(0 as bigint),
        |        cast(round(acc.run * ln(cast(n_tokens as double) / cast(acc.run as double))
        |          * 1000000d) as bigint)))),
        |  acc -> acc.acc + IF(acc.run = 0, cast(0 as bigint),
        |    cast(round(acc.run * ln(cast(n_tokens as double) / cast(acc.run as double))
        |      * 1000000d) as bigint)))""".stripMargin
    df.where(length(trim(col(textCol))) > 0) // split("") is [""], not []
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("tk"))
      .select(col(idCol), expr("array_sort(tk)").as("st"),
        size(col("tk")).cast("long").as("n_tokens"))
      .withColumn("n_distinct", size(array_distinct(col("st"))).cast("long"))
      .withColumn("entropy_sum_micro", expr(entScan))
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        expr("n_distinct * 1000 DIV n_tokens").as("ttr_milli"),
        expr("entropy_sum_micro DIV n_tokens").as("entropy_micro_per_tok"))
  }
}
