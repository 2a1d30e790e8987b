package graft

import graft.ops.Html
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private val page =
    """<html><head><title>My Page</title>
      |<style>body { color: red; }</style>
      |<script>var x = "<p>not text</p>";</script>
      |</head><body>
      |<!-- hidden comment -->
      |<h1>Hello &amp; welcome</h1>
      |<p>first   paragraph</p>
      |<a href="https://a.example/x">link one</a>
      |<a href='nope'>unquoted skipped</a>
      |<a href="/rel/y">link two</a>
      |&lt;tag&gt; &quot;quoted&quot; &#39;s &nbsp;end
      |</body></html>""".stripMargin

  test("stripHtml: scripts/styles/comments vanish, entities decode, whitespace collapses") {
    val out = Seq(page).toDF("raw").select(Html.stripHtml($"raw")).head().getString(0)
    assert(out == "My Page Hello & welcome first paragraph link one " +
      "unquoted skipped link two <tag> \"quoted\" 's end")
    // script CONTENT is gone, not just the tags
    assert(!out.contains("not text") && !out.contains("color"))
  }

  test("escaped entities survive one decode: &amp;lt; -> &lt;, never <") {
    // the chain decodes &amp; LAST; decoding it first would re-expose
    // the tail of the escaped entity to the &lt; pass (double decode)
    val out = Seq("a &amp;lt;b&amp;gt; c &amp;amp; d &amp;quot;e&amp;quot;")
      .toDF("raw").select(Html.stripHtml($"raw")).head().getString(0)
    assert(out == "a &lt;b&gt; c &amp; d &quot;e&quot;")
  }

  test("title and links extract; href matching is double-quote exact") {
    val df = Seq(page).toDF("raw")
    assert(df.select(Html.title($"raw")).head().getString(0) == "My Page")
    val links = df.select(Html.links($"raw")).head().getSeq[String](0)
    assert(links == Seq("https://a.example/x", "/rel/y"))
  }

  test("entity scanner: named, decimal/hex numeric, astral; junk stays verbatim") {
    val cases = Seq(
      // the six named refs the chain knew, plus apos; &nbsp; becomes a
      // plain space (two spaces before x: literal + decoded)
      "&amp; &lt; &gt; &quot; &apos; &nbsp;x" -> "& < > \" '  x",
      // decimal and hex numeric refs, mixed case hex marker
      "&#169; &#xA9; &#Xa9; &#233;" -> "© © © é",
      // astral plane: one codepoint, two UTF-16 units
      "&#128512;" -> new String(Character.toChars(0x1F600)),
      // malformed: unknown name, no semicolon, overlong body, bare &,
      // out-of-range and surrogate codepoints -- all verbatim
      "&bogus; &amp &#x110000; &#xD800; & &#; &#xZZ;" ->
        "&bogus; &amp &#x110000; &#xD800; & &#; &#xZZ;")
    cases.foreach { case (in, want) =>
      val got = Seq(in).toDF("raw")
        .select(graft.functions.HtmlEntityDecode.decodeEntities($"raw"))
        .head().getString(0)
      assert(got == want, s"decode($in)")
    }
  }

  test("entity scanner: single pass by construction -- &amp;lt; is &lt;, never <") {
    val got = Seq("a &amp;lt;b&amp;gt; c &amp;amp; d &amp;#169;")
      .toDF("raw")
      .select(graft.functions.HtmlEntityDecode.decodeEntities($"raw"))
      .head().getString(0)
    // each reference decodes exactly once; the output is never rescanned
    assert(got == "a &lt;b&gt; c &amp; d &#169;")
  }

  test("entity scanner: codegen and interpreted paths agree") {
    import graft.functions.HtmlEntityDecode
    import org.apache.spark.unsafe.types.UTF8String
    val inputs = Seq("", "plain", "&amp;lt;", "&#xA9;&#169;&#128512;",
      "&bogus;&#xD800;& &;", "a&nbsp;b&apos;c&quot;d")
    inputs.foreach { in =>
      // interpreted: direct expression eval on the driver
      val interp = HtmlEntityDecode(
        org.apache.spark.sql.catalyst.expressions.Literal(
          UTF8String.fromString(in)))
        .eval(null).asInstanceOf[UTF8String].toString
      // codegen: through a DataFrame projection (whole-stage codegen)
      val gen = Seq(in).toDF("raw")
        .select(HtmlEntityDecode.decodeEntities($"raw")).head().getString(0)
      assert(interp == gen, s"parity on $in")
    }
  }

  private val chromePage =
    "<html><head><title>T</title><script>var x=1;</script></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/d\">Docs</a></nav>" +
      "<div>This site uses tracking cookies for analytics purposes " +
      "<a href=\"/a\">Accept all cookies</a> " +
      "<a href=\"/d\">Decline optional cookies</a></div>" +
      "<p>The quick brown fox jumps over the lazy dog near the river " +
      "bank every single morning.</p>" +
      "<p>Copyright &#169; Tom &amp; Jerry&apos;s &amp;lt;draft&amp;gt; guide " +
      "for careful readers everywhere.</p>" +
      "<ul><li><a href=\"/r1\">Related one</a></li>" +
      "<li><a href=\"/r2\">Related two</a></li></ul>" +
      "<footer><a href=\"/p\">Privacy policy</a> | " +
      "<a href=\"/t\">Terms of service</a> | est 2001</footer></body></html>"

  test("mainContent: chrome drops (nav/list by length, banner/footer by density), body keeps") {
    val out = Seq(chromePage).toDF("raw")
      .select(Html.mainContent($"raw")).head().getString(0)
    // both body paragraphs survive, in document order, entity-decoded
    assert(out ==
      "The quick brown fox jumps over the lazy dog near the river bank " +
        "every single morning. " +
        "Copyright © Tom & Jerry's &lt;draft&gt; guide for careful " +
        "readers everywhere.")
    // chrome is gone: nav anchors, cookie banner, related list, footer
    Seq("Home", "cookies", "Related", "Privacy").foreach(w =>
      assert(!out.contains(w), s"chrome word $w leaked"))
  }

  test("mainContent edges: short block drops, all-anchor block drops, long prose keeps") {
    val prose = "All happy families are alike but every unhappy family " +
      "is unhappy in its own particular way."
    val cases = Seq(
      // a block below minTextLen vanishes even with zero links
      s"<p>too short</p><p>$prose</p>" -> prose,
      // an all-anchor block of any length is density 1000 -> dropped
      ("<p><a href=\"/x\">This anchor text is certainly longer than the " +
        s"twenty-five char floor</a></p><p>$prose</p>") -> prose,
      // hostile: unclosed tags degrade, never throw
      s"<p>$prose<p><<<>" -> prose)
    cases.foreach { case (in, want) =>
      val got = Seq(in).toDF("raw").select(Html.mainContent($"raw"))
        .head().getString(0)
      assert(got == want, s"mainContent($in)")
    }
  }

  test("hostile input degrades, never errors; ratio gates markup-heavy pages") {
    val hostile = Seq(
      "", "<", ">", "<<<>>>", "<script>never closed",
      "<p>ok</p><!-- unclosed comment", "plain text no markup at all")
    val out = hostile.toDF("raw")
      .select(Html.stripHtml($"raw").as("clean"),
        Html.visibleRatioMilli($"raw", Html.stripHtml($"raw")).as("m"))
      .collect()
    assert(out.length == hostile.length) // nothing threw
    out.foreach(r => assert(r.getLong(1) >= 0L && r.getLong(1) <= 1000L))
    // plain text passes through untouched at ratio 1000
    assert(out.last.getString(0) == "plain text no markup at all"
      && out.last.getLong(1) == 1000L)
    // a markup-dominated page scores below a text-dominated one
    val mk = Seq("<div><div><div>x</div></div></div>").toDF("raw")
      .select(Html.visibleRatioMilli($"raw", Html.stripHtml($"raw")))
      .head().getLong(0)
    assert(mk < 100L, s"markup-heavy ratio $mk")
  }
}
