package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML -> text extraction: the first stage of every web-crawl
  * training corpus (the reference's pipelines start from tabular
  * sources and never face markup; this is extension surface,
  * SURVEY.md §2.4).
  *
  * Everything is a chain of built-in `regexp_replace` /
  * `regexp_extract` calls — codegen'd, narrow, zero UDFs — and every
  * pattern stays inside the RE2-compatible subset (no backreferences,
  * no lookaround), so the DuckDB oracle replays extraction
  * byte-for-byte (q109). Regex-based stripping is the
  * boilerplate-removal baseline (the trafilatura-class DOM walk is a
  * codec-style add-on, same plumbing); it is total on hostile input —
  * unclosed tags and junk brackets degrade to dropped spans, never
  * errors.
  *
  * At 100 TB: each op is a per-row map pipelined into whatever scan
  * feeds it — no shuffle, no state; quality gating composes via
  * [[visibleRatioMilli]] (markup-dominated pages score low and get
  * filtered before the expensive stages).
  */
object Html {

  private val scriptPat = "(?is)<script[^>]*>.*?</script>"
  private val stylePat = "(?is)<style[^>]*>.*?</style>"
  private val commentPat = "(?s)<!--.*?-->"
  private val tagPat = "<[^>]*>"

  /** Visible text: script/style blocks (with contents) and comments
    * removed first, remaining tags become spaces, the six ubiquitous
    * entities decode, whitespace collapses. Deterministic and
    * engine-portable by construction.
    *
    * `&amp;` decodes LAST — the standard chain-decoder rule: decoding
    * it first re-exposes the tail of an ESCAPED entity to the later
    * passes, so literal `&amp;lt;` (an author writing "&lt;") would
    * double-decode to `<` instead of the correct `&lt;`.
    */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, scriptPat, " ")
    val noStyle = regexp_replace(noScript, stylePat, " ")
    val noComment = regexp_replace(noStyle, commentPat, " ")
    val noTags = regexp_replace(noComment, tagPat, " ")
    val decoded = decodeChain(noTags)
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The shared entity chain (`&amp;` last — see [[stripHtml]]). Kept
    * as a named step so every extraction path (full strip, per-block
    * main content) decodes identically to the SQL oracle's replay.
    */
  private[ops] def decodeChain(c: Column): Column =
    Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(c) { case (col, (ent, ch)) => regexp_replace(col, ent, ch) }

  /** First `<title>` body (empty string when absent). */
  def title(c: Column): Column =
    regexp_extract(c, "(?is)<title[^>]*>([^<]*)</title>", 1)

  /** All `href="..."` targets, in document order. */
  def links(c: Column): Column =
    regexp_extract_all(c, lit("href=\"([^\"]*)\""), lit(1))

  /** Visible-to-raw length ratio in milli: a page that is mostly
    * markup scores low — the cheap boilerplate-dominance gate.
    * Integer floor division done exactly (subtract the remainder
    * before dividing, so the double division is of an exact multiple
    * — bit-identical to the oracle's `//`).
    */
  def visibleRatioMilli(raw: Column, clean: Column): Column = {
    val num = length(clean).cast("long") * 1000L
    val den = length(raw).cast("long")
    when(den === 0L, 0L)
      .otherwise(((num - pmod(num, den)) / den).cast("long"))
  }
}
