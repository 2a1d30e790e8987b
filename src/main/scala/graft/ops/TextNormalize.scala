package graft.ops

import graft.functions.UnicodeNormalize
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus text normalization — the canonical-form pass that runs
  * BEFORE tokenization/fingerprinting so byte-level variance of the
  * same visible text ("café" precomposed vs decomposed, NBSP vs
  * space, doubled whitespace) cannot split dedup groups, shingle
  * sets, or vocabulary counts. Each piece is a narrow per-row
  * expression (native [[UnicodeNormalize]] + built-ins), zero
  * shuffles — composes into any scan.
  */
object TextNormalize {

  /** Canonical composition (NFC): the storage/interchange form. */
  def nfc(c: Column): Column = UnicodeNormalize.normalized(c, "NFC")

  /** Accent/diacritic strip: NFD decomposition, then remove combining
    * marks (`\p{M}`). Deliberately composed from the normalize
    * expression + built-in regexp_replace rather than a second custom
    * expression.
    */
  def stripAccents(c: Column): Column =
    regexp_replace(UnicodeNormalize.normalized(c, "NFD"), "\\p{M}", "")

  /** Whitespace canonicalization: any Unicode whitespace run → one
    * space, trimmed. `\s` alone misses U+00A0 NBSP and the other
    * Zs separators — endemic in HTML-derived corpora — so the class
    * is `[\p{Z}\s]` (space separators + ASCII controls).
    */
  def collapseWhitespace(c: Column): Column =
    trim(regexp_replace(c, "[\\p{Z}\\s]+", " "))

  /** The full canonical form: NFC + accent strip + whitespace
    * collapse + lowercase — the key a cross-source exact-dedup or
    * vocabulary build should group on.
    */
  def canonical(c: Column): Column =
    lower(collapseWhitespace(stripAccents(c)))
}
