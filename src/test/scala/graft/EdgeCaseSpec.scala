package graft

import graft.ops.{AsOf, Dedup}
import java.sql.Timestamp
import org.apache.spark.sql.functions.{col, lit}

class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join: latest of MULTIPLE prior right rows wins; future rows never match") {
    def ts(s: String) = Timestamp.valueOf(s)
    val quotes = Seq(
      ("A", ts("2024-01-01 09:00:00"), 90.0),
      ("A", ts("2024-01-01 09:30:00"), 95.0),
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 23:00:00"), 999.0) // future: must never match
    ).toDF("sym", "qts", "px")
    val trades = Seq(("A", ts("2024-01-01 10:30:00"), 1L)).toDF("sym", "tts", "trade_id")
    val out = AsOf.joinAsOf(trades, quotes, "sym", "tts", "qts", Seq("px"))
      .select("px_asof").as[Double].head()
    assert(out == 100.0)
  }

  test("LSH maxBucketSize drops degenerate hot buckets instead of exploding") {
    val fiveIdentical = (1L to 5L)
      .map(i => (i, "exactly the same words appear here in all five documents today"))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(fiveIdentical, "doc_id", "text", k = 8)
    val unbounded = Dedup.lshCandidatePairs(sig, "doc_id", 4, 2).count()
    assert(unbounded == 10L) // C(5,2) pairs from identical docs
    val bounded = Dedup.lshCandidatePairs(sig, "doc_id", 4, 2, maxBucketSize = 4).count()
    assert(bounded == 0L) // all buckets have size 5 > 4 -> dropped
  }

  test("exact dedup treats NULL text distinctly from empty string") {
    val d = Seq((1L, Some("")), (2L, Some("")), (3L, None))
      .toDF("doc_id", "text")
    val out = Dedup.exactDedup(d, "doc_id", Seq("text"))
      .orderBy("keeper_id").collect()
    // reference semantics: null -> '' inside the hash, so NULL and ''
    // intentionally collide (documented O-8 contract)
    assert(out.length == 1 && out(0).getLong(1) == 1L && out(0).getLong(2) == 3L)
  }

  test("normalizeNames leaves already-canonical frames untouched") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    assert(graft.ops.SchemaOps.normalizeNames(li).columns.toSeq == li.columns.toSeq)
  }

  test("incremental dedup against an EMPTY history keeps the whole batch") {
    import graft.ops.IncrementalDedup
    val batch = Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "fp")
    val emptyHist = batch.select("fp").where(lit(false))
    val out = IncrementalDedup.dedupAgainst(batch, emptyHist, "fp",
      expectedItems = 100L)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("incremental dedup keeps null-fingerprint rows, matching the anti-join") {
    import graft.ops.IncrementalDedup
    val batch = Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)))
      .toDF("doc_id", "fp")
    val hist = Seq(Tuple1(10L)).toDF("fp")
    val plain = batch.join(hist, Seq("fp"), "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(plain == Seq(2L, 3L)) // null fp survives the anti-join
    val got = IncrementalDedup.dedupAgainst(batch, hist, "fp", 100L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == plain)
  }

  test("mixture resample: unlisted domain honors defaultMilli") {
    import graft.ops.Sampling
    val d = Seq((1L, "aa"), (2L, "aa"), (3L, "zz"), (4L, "zz"))
      .toDF("doc_id", "lang")
    // zz unlisted: default 1000 keeps all; default 0 drops all
    val keepAll = Sampling.mixtureResample(d, "doc_id", "lang",
      Map("aa" -> 1000), defaultMilli = 1000)
    assert(keepAll.where(col("lang") === "zz").count() == 2L)
    val dropAll = Sampling.mixtureResample(d, "doc_id", "lang",
      Map("aa" -> 1000), defaultMilli = 0)
    assert(dropAll.where(col("lang") === "zz").count() == 0L)
  }
}
