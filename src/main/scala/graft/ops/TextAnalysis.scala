package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis operators for training-data pipelines: tokenization,
  * language-ID heuristic, quality scoring, canonical fingerprinting.
  *
  * All pure built-in expressions (split/filter/regexp/md5): fully
  * codegen'd, no UDFs, no shuffle beyond what the caller aggregates —
  * at 100 TB these run inside the scan's codegen stage.
  *
  * Integer "milli" ratios are used instead of double ratios so results
  * are exact and engine-independent (see graft.queries.dec rationale).
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** PII scrubbing: redact emails, URLs, and long digit runs (phone/
    * account numbers) with typed placeholders. Patterns use only
    * regex constructs shared by Java regex and RE2, so the scrub is
    * reproducible in any engine (q83's oracle re-runs it in DuckDB).
    * A narrow, codegen'd map — the standard first hop before text is
    * allowed into a training corpus.
    */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val url = regexp_replace(email,
      "https?://[^ ]+", "<URL>")
    regexp_replace(url, "[0-9][0-9 ()+.-]{6,}[0-9]", "<NUMBER>")
  }

  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** Occurrences of an exact token. */
  def termCount(toks: Column, term: String): Column =
    size(filter(toks, t => t === term)).cast(LongType)

  /** Canonical form: lowercase, strip non-alphanumerics, collapse
    * whitespace — the normalization step of document fingerprinting.
    */
  def canonicalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Content fingerprint = md5 of the canonical form (the document-level
    * generalization of the reference's row hash, O-8).
    */
  def fingerprint(text: Column): Column = md5(canonicalize(text))

  /** Language marker words for the n-gram language-ID heuristic. */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "the", "de" -> "und", "es" -> "el", "fr" -> "le", "zh" -> "的")

  /** Heuristic language ID: count marker-token hits per language and
    * take the first language (in `langMarkers` order) whose score is >=
    * all later scores — a deterministic CASE chain, "unknown" when no
    * marker matches at all.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.map { case (lang, marker) =>
      lang -> termCount(toks, marker)
    }
    val total = scores.map(_._2).reduce(_ + _)
    val chain = scores.init.zipWithIndex.foldLeft(when(total === 0, lit("unknown"))) {
      case (acc, ((lang, score), i)) =>
        val rest = scores.drop(i + 1).map(_._2)
        acc.when(rest.map(score >= _).reduce(_ && _), lit(lang))
    }
    chain.otherwise(lit(scores.last._1))
  }

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** Stopword hits among tokens. */
  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast(LongType)

  /** Punctuation characters in the raw text. */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast(LongType)
}
