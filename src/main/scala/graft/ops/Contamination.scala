package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: flag training documents that
  * share verbatim n-grams with an evaluation/benchmark set — the
  * standard decontamination pass (the GPT-3/PaLM papers use 8-13 word
  * grams) every serious pretraining pipeline runs before training.
  *
  * Scale shape: the benchmark side is SMALL (eval suites are a few
  * thousand documents) and is broadcast — the 100 TB corpus is never
  * shuffled to find hits. Per-document grams are deduplicated INSIDE
  * the row (`array_distinct` before the explode), so the joined
  * volume is bounded by distinct-gram count, and the final per-doc
  * aggregation only shuffles actual hits (a tiny fraction of the
  * corpus). A no-hit document costs one broadcast-hash probe per
  * distinct gram and nothing else.
  */
object Contamination {

  /** (id, gram) pairs, one row per DISTINCT `n`-word shingle per
    * document; documents shorter than `n` tokens have no grams.
    */
  def distinctShingles(df: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame =
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("tk"))
      .where(size(col("tk")) >= n)
      .select(col(idCol),
        explode(expr(s"array_distinct(${Dedup.shingleExpr(n)})")).as("sh"))

  /** Contaminated corpus documents: for each corpus doc sharing at
    * least one `n`-gram with any benchmark doc, the number of distinct
    * overlapping grams, the number of benchmark docs hit, and the
    * smallest benchmark doc id (a deterministic exemplar).
    */
  def check(corpus: DataFrame, bench: DataFrame, idCol: String,
            textCol: String, n: Int): DataFrame = {
    val cs = distinctShingles(corpus, idCol, textCol, n)
    val bs = distinctShingles(bench, idCol, textCol, n)
      .select(col(idCol).as("bench_id"), col("sh"))
    cs.join(broadcast(bs), "sh")
      .groupBy(idCol)
      .agg(countDistinct(col("sh")).as("n_hit_grams"),
        countDistinct(col("bench_id")).as("n_bench_docs"),
        min(col("bench_id")).as("first_bench_id"))
  }

  /** Corpus-wide n-gram document-frequency statistics: for each
    * distinct `n`-gram, how many documents contain it and the smallest
    * containing doc id (a deterministic exemplar). The raw material
    * for boilerplate/template detection and blocklist construction —
    * a gram appearing in thousands of documents is navigation chrome,
    * not content.
    *
    * Scale shape: grams are deduplicated inside the row before the
    * explode, and the groupBy partial-aggregates map-side (count and
    * min both combine), so the shuffle carries one record per distinct
    * (gram, partition) — not per occurrence. `minDf` prunes the long
    * singleton tail BEFORE any downstream consumer sees it.
    */
  def gramDocFrequency(docs: DataFrame, idCol: String, textCol: String,
                       n: Int, minDf: Long = 2L): DataFrame =
    distinctShingles(docs, idCol, textCol, n)
      .groupBy("sh")
      .agg(count(lit(1)).as("df"), min(col(idCol)).as("first_doc"))
      .where(col("df") >= minDf)

  /** The removal composite: corpus minus every contaminated document
    * (left anti-join against [[check]]'s hit set — hits are tiny, so
    * the anti-join broadcasts).
    */
  def decontaminate(corpus: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int): DataFrame =
    corpus.join(broadcast(check(corpus, bench, idCol, textCol, n).select(idCol)),
      Seq(idCol), "left_anti")
}
