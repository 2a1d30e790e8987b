package graft

import graft.ops.{Dedup, PrefixJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PrefixJoin: the prefix-filtered self-join must equal the
  * brute-force all-pairs exact-Jaccard join EXACTLY — the prefix
  * filter theorem claims losslessness, so one missing pair is a bug,
  * not an approximation. Brute force = exact verification over the
  * complete id cross product.
  */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(docs: DataFrame, w: Int, m: Long): Set[(Long, Long, Long, Long)] = {
    val ids = docs.select(col("doc_id")).as[Long].collect().sorted
    val allPairs = (for {
      a <- ids; b <- ids if a < b
    } yield (a, b)).toSeq.toDF("doc_a", "doc_b")
    Dedup.verifyCandidatePairs(docs, "doc_id", "text", allPairs, w, m)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  private def prefixed(docs: DataFrame, w: Int, m: Long): Set[(Long, Long, Long, Long)] =
    PrefixJoin.selfJoin(docs, "doc_id", "text", w, m)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("equals brute force on the fixture corpus across thresholds and widths") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (w <- Seq(2, 3); m <- Seq(300L, 500L, 800L)) {
      val got = prefixed(docs, w, m)
      val want = bruteForce(docs, w, m)
      assert(got == want, s"w=$w m=$m: got ${got.size}, want ${want.size}")
    }
  }

  test("adversarial corpus: high-df-only overlap, identical docs, near-misses") {
    // docs 1/2 identical (J=1), 3 shares ONLY the corpus's most
    // common shingles with 1/2 (the prefix filter must still find it
    // when J meets the threshold), 4/5 a near-miss just UNDER the
    // threshold, 6 disjoint
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox sleeps all day long today"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta"),
      (5L, "alpha beta gamma delta iota kappa lambda mu"),
      (6L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    for (m <- Seq(100L, 250L, 400L, 700L, 1000L)) {
      val got = prefixed(docs, 2, m)
      val want = bruteForce(docs, 2, m)
      assert(got == want, s"m=$m: got $got, want $want")
    }
    // the identical pair is present at the strictest threshold
    assert(prefixed(docs, 2, 1000L).exists(p => p._1 == 1L && p._2 == 2L))
  }

  test("plan has no CartesianProduct") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val plan = PrefixJoin.selfJoin(docs, "doc_id", "text", 2, 500L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  // ---- containment (asymmetric) variant ---------------------------

  private def shingleSets(docs: DataFrame, w: Int): Map[Long, Set[String]] =
    docs.select(col("doc_id"), graft.ops.TextAnalysis.tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= w)
      .select(col("doc_id"),
        expr(s"array_distinct(${Dedup.shingleExpr(w)})").as("shs"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, shs) => id -> shs.toSet }.toMap

  private def bruteContain(docs: DataFrame, w: Int, m: Long): Set[(Long, Long, Long, Long)] = {
    val ss = shingleSets(docs, w)
    (for {
      (a, sa) <- ss.toSeq; (b, sb) <- ss.toSeq if a != b
      nc = (sa & sb).size.toLong
      cm = nc * 1000L / sa.size if cm >= m
    } yield (a, b, nc, cm)).toSet
  }

  test("containment equals brute force on the fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (w <- Seq(2, 3); m <- Seq(400L, 600L, 900L)) {
      val got = PrefixJoin.containmentSelfJoin(docs, "doc_id", "text", w, m)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = bruteContain(docs, w, m)
      assert(got == want, s"w=$w m=$m: got ${got.size}, want ${want.size}")
    }
  }

  test("containment is directed: the subset doc is contained, the superset is not") {
    // doc 1's shingles are a strict subset of doc 2's
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "one two three four five")
    ).toDF("doc_id", "text")
    val got = PrefixJoin.containmentSelfJoin(docs, "doc_id", "text", 2, 900L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // 1 -> 2 at containment 1.0; nothing else reaches 0.9
    assert(got == Set((1L, 2L, 1000L)), got.toString)
    // and the same corpus under brute force agrees at every threshold
    for (m <- Seq(100L, 300L, 1000L)) {
      val g = PrefixJoin.containmentSelfJoin(docs, "doc_id", "text", 2, m)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(g == bruteContain(docs, 2, m), s"m=$m")
    }
  }
}
