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
