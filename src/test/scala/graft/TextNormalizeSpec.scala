package graft

import graft.functions.UnicodeNormalize
import graft.ops.TextNormalize
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class TextNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("NFC composes, NFD decomposes, NFKC folds compatibility forms") {
    val decomposed = "café" // e + combining acute
    val composed = "café" // precomposed é
    val rows = Seq((decomposed, composed)).toDF("d", "c")
      .select(
        UnicodeNormalize.normalized($"d", "NFC").as("d_nfc"),
        UnicodeNormalize.normalized($"c", "NFD").as("c_nfd"),
        length(UnicodeNormalize.normalized($"d", "NFC")).as("l_nfc"),
        UnicodeNormalize.normalized(lit("\u2460 \ufb01"), "NFKC").as("k"))
      .head()
    assert(rows.getString(0) == composed)
    assert(rows.getString(1) == decomposed)
    assert(rows.getInt(1 + 1) == 4)
    assert(rows.getString(3) == "1 fi") // circled one + fi ligature fold
  }

  test("codegen and interpreted paths agree; ASCII fast path is identity") {
    val inputs = Seq("", "plain ascii", "café é", "á́",
      "ﬁx ①", "mixed café café")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD"); in <- inputs) {
      val interp = UnicodeNormalize(
        org.apache.spark.sql.catalyst.expressions.Literal(
          UTF8String.fromString(in)), form)
        .eval(null).asInstanceOf[UTF8String].toString
      val gen = Seq(in).toDF("raw")
        .select(UnicodeNormalize.normalized($"raw", form)).head().getString(0)
      assert(interp == gen, s"parity on form=$form in=$in")
      assert(interp == java.text.Normalizer.normalize(
        in, java.text.Normalizer.Form.valueOf(form)))
    }
  }

  test("invalid form fails at construction, nulls pass through") {
    intercept[IllegalArgumentException] {
      UnicodeNormalize(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), "NFX")
    }
    val r = Seq[Option[String]](None).toDF("s")
      .select(TextNormalize.nfc($"s")).head()
    assert(r.isNullAt(0))
  }

  test("canonical key: accents, whitespace runs (incl. NBSP) and case collapse") {
    // the first literal deliberately hides a U+00A0 NBSP and a
    // combining mark inside the runs — the HTML-derived reality a
    // plain \s+ collapse misses
    val got = Seq("  Café   du  MONDE ", "café du monde")
      .toDF("s").select(TextNormalize.canonical($"s")).as[String]
      .collect().toSeq
    assert(got == Seq("cafe du monde", "cafe du monde"))
  }
}
