package graft

import graft.functions.MinHashShingles
import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class MinHashSpec extends SparkSpec {
  import spark.implicits._

  /** Straight-line reference implementation of the same hash design
    * (FNV-1a per token, polynomial window combine + splitmix64, KM
    * families mod 2^32) to pin the expression's semantics.
    */
  private def reference(tokens: Seq[String], k: Int, width: Int): Option[Seq[Long]] = {
    if (tokens.length < width) return None
    def fnv(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0xcbf29ce484222325L)((h, b) =>
        (h ^ (b & 0xffL)) * 0x100000001b3L)
    val th = tokens.map(fnv)
    val mins = Array.fill(k)(Long.MaxValue)
    for (s <- 0 to tokens.length - width) {
      var hh = 0L
      for (w <- 0 until width) hh = hh * 0x9e3779b97f4a7c15L + th(s + w)
      hh ^= (hh >>> 30); hh *= 0xbf58476d1ce4e5b9L
      hh ^= (hh >>> 27); hh *= 0x94d049bb133111ebL
      hh ^= (hh >>> 31)
      val h1 = hh & 0xffffffffL; val h2 = hh >>> 32
      for (j <- 0 until k) {
        val v = (h1 + j * h2) & 0xffffffffL
        if (v < mins(j)) mins(j) = v
      }
    }
    Some(mins.toSeq)
  }

  test("expression matches the reference implementation (codegen and interpreted)") {
    val docs = Seq(
      (1L, Seq("the", "quick", "brown", "fox", "jumps")),
      (2L, Seq("alpha", "beta", "gamma")),
      (3L, Seq("alpha", "beta", "gamma")), // exact duplicate of 2
      (4L, Seq("unicode", "tökens", "日本語", "bytes", "matter")))
      .toDF("id", "tk")

    val got = docs.select(col("id"),
      MinHashShingles.minhashArray(col("tk"), 8, 3).as("mh"))
      .as[(Long, Seq[Long])].collect().toMap
    Seq(
      1L -> Seq("the", "quick", "brown", "fox", "jumps"),
      2L -> Seq("alpha", "beta", "gamma"),
      4L -> Seq("unicode", "tökens", "日本語", "bytes", "matter")
    ).foreach { case (id, toks) =>
      assert(got(id) == reference(toks, 8, 3).get, s"id=$id")
    }
    assert(got(2L) == got(3L), "exact duplicates share the signature")

    // interpreted (non-codegen) eval path agrees
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val arr = new GenericArrayData(
      Array[Any](UTF8String.fromString("alpha"), UTF8String.fromString("beta"),
        UTF8String.fromString("gamma")))
    val interp = MinHashShingles.compute(arr, 8, 3).toLongArray().toSeq
    assert(interp == got(2L))
    // every value is in the 32-bit KM domain
    assert(got.values.flatten.forall(v => v >= 0 && v < 4294967296L))
  }

  test("short documents yield null, and the fast path plan has no shuffle") {
    val docs = Seq((1L, Seq("only", "two"))).toDF("id", "tk")
    val r = docs.select(MinHashShingles.minhashArray(col("tk"), 4, 3).as("mh"))
      .collect()
    assert(r.head.isNullAt(0))

    val sig = Dedup.minhashSignaturesFast(
      Seq((1L, "one two three four five six")).toDF("doc_id", "text"),
      "doc_id", "text", k = 8)
    val plan = sig.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"signature computation must be a narrow map:\n$plan")
    assert(sig.columns.toSeq == "doc_id" +: (0 until 8).map(j => s"h$j"))
  }
}
