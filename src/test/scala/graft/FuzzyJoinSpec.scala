package graft

import graft.ops.FuzzyJoin
import org.scalatest.funsuite.AnyFunSuite

/** FuzzyJoin: the blocked self-join must equal the brute-force cross
  * join exactly — the q-gram count filter plus the short-string
  * stratum is provably lossless, so any divergence is a bug, not an
  * approximation.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(vocab: Seq[String], d: Int, q: Int = 2): (Set[(String, String, Long)], Set[(String, String, Long)]) = {
    val df = vocab.toDF("term")
    val got = FuzzyJoin.selfJoin(df, "term", d, q).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = FuzzyJoin.bruteForce(df, "term", d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    (got, want)
  }

  test("matches brute force on a hand-built vocabulary (d=2, q=2)") {
    // covers: short-short pairs sharing NO gram (hot/rod), mixed
    // short/long (cold/old), repeats inside a term (aaab/aaab-ish),
    // and far-apart terms that must NOT match
    val v = Seq("hot", "rod", "old", "cold", "bolt", "ring", "rings",
      "spring", "data", "date", "dates", "widget", "widgets", "gadget",
      "aaab", "aaba", "zzzz")
    val (got, want) = run(v, 2)
    assert(got == want)
    // sanity: the zero-shared-gram short pair is present
    assert(got.contains(("hot", "rod", 2L)))
    assert(got.contains(("cold", "old", 1L)))
  }

  test("matches brute force at d=1 and d=3, q=2 and q=3") {
    val v = Seq("a", "ab", "abc", "abd", "bc", "xyz", "xy", "x",
      "banana", "bananas", "bandana", "cabana", "panama")
    for (d <- Seq(1, 3); q <- Seq(2, 3)) {
      val (got, want) = run(v, d, q)
      assert(got == want, s"mismatch at d=$d q=$q")
    }
  }

  test("matches brute force on a seeded random vocabulary") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcd" // small alphabet => dense near-collisions
    val v = Seq.fill(120)(
      (0 until (1 + rnd.nextInt(7))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      .distinct
    val (got, want) = run(v, 2)
    assert(got == want)
    assert(want.nonEmpty) // the fixture actually exercises matching
  }

  test("no self pairs, ordered pairs only, dist bounded") {
    val v = Seq("aa", "ab", "ba", "bb")
    val (got, _) = run(v, 1)
    got.foreach { case (a, b, d) =>
      assert(a < b); assert(d >= 1 && d <= 1)
    }
  }

  test("candidate generation is gram-bucketed, not a corpus cross join") {
    // the only nested-loop allowed is the bounded short-short stratum
    // (both sides broadcast); the long stratum must be an equi-join
    // on (gram, occ). Assert no CartesianProduct in the plan.
    val df = (1 to 50).map(i => s"term$i").toDF("term")
    val plan = FuzzyJoin.selfJoin(df, "term", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
