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
    * removed first, remaining tags become spaces, character references
    * decode, whitespace collapses. Deterministic and engine-portable
    * by construction.
    *
    * Entity decode is [[graft.functions.HtmlEntityDecode]] — a
    * single-pass codegen'd scanner that decodes each reference exactly
    * once, left to right, never rescanning its own output. That gives
    * the chain-decoder's `&amp;`-last guarantee (`&amp;lt;` is `&lt;`,
    * never `<`) BY CONSTRUCTION, plus decimal/hex numeric references
    * (`&#169;`, `&#xA9;`) the fixed six-entity chain could not spell.
    * A SQL oracle replays it with per-entity `replace` calls (named
    * refs first, `&amp;` last) for the references present in its
    * input.
    */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, scriptPat, " ")
    val noStyle = regexp_replace(noScript, stylePat, " ")
    val noComment = regexp_replace(noStyle, commentPat, " ")
    val noTags = regexp_replace(noComment, tagPat, " ")
    val decoded = decodeEntities(noTags)
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The single entity-decode path for every extraction op (full
    * strip, per-block main content, anchor-text normalization) — one
    * decoder, one semantics, no chain/scanner fork.
    */
  private[ops] def decodeEntities(c: Column): Column =
    graft.functions.HtmlEntityDecode.decodeEntities(c)

  /** First `<title>` body (empty string when absent). */
  def title(c: Column): Column =
    regexp_extract(c, "(?is)<title[^>]*>([^<]*)</title>", 1)

  // ---------------------------------------------------------------
  // Main-content extraction (boilerplate-block removal)
  // ---------------------------------------------------------------

  /** Block-level tag boundary — the segmentation rule of the
    * jusText/trafilatura family: content lives in block elements, and
    * nav bars / footers / cookie banners are DIFFERENT blocks from the
    * body text, so scoring per block separates them where a uniform
    * strip ([[stripHtml]]) cannot.
    */
  private val blockTagPat =
    "(?i)</?(p|div|h[1-6]|li|ul|ol|dl|dt|dd|td|th|tr|table|thead|tbody|" +
      "nav|header|footer|aside|section|article|main|form|blockquote|pre|" +
      "br|hr)\\b[^>]*>"

  private val anchorPat = "(?is)<a[^>]*>(.*?)</a>"

  /** A block's visible text: inline tags -> spaces, entity decode,
    * whitespace collapse. Shared by the keep-filter and the output
    * pass so both see identical strings.
    */
  private def blockText(b: Column): Column =
    trim(regexp_replace(decodeEntities(regexp_replace(b, tagPat, " ")), "\\s+", " "))

  /** Total visible length of the block's anchor texts — the SAME
    * normalization as [[blockText]] (tags -> spaces, entity decode,
    * whitespace collapse), so the density ratio's numerator and
    * denominator count identical characters: `&amp;` inside an anchor
    * is one char on both sides, not five over one.
    */
  private def linkTextLen(b: Column): Column =
    coalesce(aggregate(
      transform(regexp_extract_all(b, lit(anchorPat), lit(1)),
        a => length(trim(regexp_replace(
          decodeEntities(regexp_replace(a, tagPat, " ")),
          "\\s+", " "))).cast("long")),
      lit(0L), (acc, x) => acc + x), lit(0L))

  /** Link density in milli from a block's raw markup and its
    * already-computed visible text: anchor-text chars per visible
    * char. A nav bar or footer is ~all anchor text (>= ~900); body
    * prose is ~0. Same exact floor division as [[visibleRatioMilli]].
    */
  private def linkDensityMilli(raw: Column, txt: Column): Column = {
    val num = linkTextLen(raw) * 1000L
    val den = greatest(length(txt).cast("long"), lit(1L))
    ((num - pmod(num, den)) / den).cast("long")
  }

  /** Main content: segment the page into blocks at block-level tags,
    * keep the blocks that read like body text, drop the ones that read
    * like chrome, and rejoin in document order.
    *
    * The keep rule is the jusText shape reduced to its two strongest
    * signals, both exact-integer so the SQL oracle replays them:
    *   - '''length''': a content block carries at least `minTextLen`
    *     visible chars — "Share:", timestamps, button labels fall out;
    *   - '''link density''': at most `maxLinkMilli` of the block's
    *     visible chars sit inside `<a>` — nav bars, footer link rows,
    *     cookie banners (accept/decline anchors dominate) fall out.
    *
    * Everything is one narrow per-row expression — split, score,
    * filter, and rejoin run inside the row with zero shuffle and zero
    * UDFs, so at 100 TB this pipelines into the scan exactly like
    * [[stripHtml]]. Script/style/comment contents are removed BEFORE
    * segmentation (they are not content in any block).
    */
  def mainContent(c: Column, minTextLen: Int = 25,
                  maxLinkMilli: Int = 330): Column = {
    val noScript = regexp_replace(c, scriptPat, " ")
    val noStyle = regexp_replace(noScript, stylePat, " ")
    val noComment = regexp_replace(noStyle, commentPat, " ")
    val blocks = split(noComment, blockTagPat)
    // blockText once per block: the struct carries (raw, visible) so
    // the length filter, density denominator, and output pass all read
    // the one computed string instead of re-deriving it
    val scored = transform(blocks, b =>
      struct(b.as("raw"), blockText(b).as("txt")))
    val kept = filter(scored, s =>
      length(s.getField("txt")) >= minTextLen &&
        linkDensityMilli(s.getField("raw"), s.getField("txt")) <= maxLinkMilli)
    array_join(transform(kept, s => s.getField("txt")), " ")
  }

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
