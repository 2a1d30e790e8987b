package graft

import graft.ops.SpanScrub
import org.apache.spark.sql.functions._

class SpanScrubSpec extends SparkSpec {
  import spark.implicits._

  private val tkSql = "split(lower(trim(text)), '\\\\s+')"

  private def stats(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Long, Long)] =
    SpanScrub.dupSpanStats(rows.toDF("doc_id", "text"), "doc_id", tkSql, n = 5)
      .select("doc_id", "n_tokens", "n_masked", "n_kept", "masked_milli")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("a shared 6-token span masks exactly its 6 positions in both hosts") {
    // the span yields two overlapping duplicated 5-grams; covered
    // positions must be counted once (distinct), 6 not 10
    val span = "alpha bravo charlie delta echo foxtrot"
    val got = stats(Seq(
      (1L, s"one two $span three four"),
      (2L, s"p q r s $span t u"),
      (3L, "totally unrelated words here nothing shared at all")))
    assert(got(1L) == ((10L, 6L, 4L, 600L)))
    assert(got(2L) == ((12L, 6L, 6L, 500L)))
    assert(got(3L) == ((8L, 0L, 8L, 0L)))
  }

  test("within-doc repetition alone never masks; cross-doc sharing does") {
    val rep = "x1 x2 x3 x4 x5"
    val got = stats(Seq(
      (1L, s"$rep filler $rep"),             // same 5-gram twice, one doc
      (2L, "completely different text with no overlap at all present")))
    assert(got(1L)._2 == 0L, "intra-doc repetition must not mask")
  }

  test("docs shorter than the gram width pass through unmasked") {
    val got = stats(Seq(
      (1L, "a b c"),
      (2L, "a b c"),                          // identical but only 3 tokens
      (3L, "u v w x y z longer unique content here")))
    assert(got(1L) == ((3L, 0L, 3L, 0L)))
    assert(got(2L) == ((3L, 0L, 3L, 0L)))
  }

  test("two-pass (hash df + bloom + string verify) equals single-pass exactly") {
    // includes intra-doc repetition, a shared span, short docs, and a
    // 3-host span under minDf=2 — every branch of the verify logic
    val span = "alpha bravo charlie delta echo foxtrot"
    val rows = Seq(
      (1L, s"one two $span three four"),
      (2L, s"p q r s $span t u"),
      (3L, s"$span leading here"),
      (4L, "x1 x2 x3 x4 x5 filler x1 x2 x3 x4 x5"),
      (5L, "a b c"),
      (6L, "totally unrelated words here nothing shared at all"))
    val df = rows.toDF("doc_id", "text")
    def run(two: Boolean) =
      SpanScrub.dupSpanStats(df, "doc_id", tkSql, n = 5, twoPass = two)
        .select("doc_id", "n_tokens", "n_masked", "n_kept", "masked_milli")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(two = true) == run(two = false))
    assert(run(two = true).exists(_._3 > 0L), "fixture: nothing masked")
  }

  test("masking threshold respects minDf") {
    val span = "s1 s2 s3 s4 s5"
    val df = Seq(
      (1L, s"$span a b"), (2L, s"$span c d"), (3L, s"$span e f"))
      .toDF("doc_id", "text")
    // df = 3 hosts; minDf = 4 must not mask anyone
    val none = SpanScrub.dupSpanStats(df, "doc_id", tkSql, n = 5, minDf = 4)
      .agg(sum("n_masked")).as[Long].head()
    assert(none == 0L)
    val all = SpanScrub.dupSpanStats(df, "doc_id", tkSql, n = 5, minDf = 3)
      .agg(sum("n_masked")).as[Long].head()
    assert(all == 15L)
  }
}
