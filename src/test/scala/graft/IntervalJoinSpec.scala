package graft

import graft.ops.IntervalJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IntervalJoin: the bin-bucketed join must equal the quadratic form
  * exactly — bin sharing is a lossless candidate generator and the
  * first-shared-bin rule must emit every overlapping pair exactly
  * once (a duplicate would double rows in any downstream agg).
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("a_id", "b_id", "overlap_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("matches brute force on seeded random intervals, several bin widths") {
    val rnd = new scala.util.Random(31)
    val iv = (1 to 300).map { i =>
      val s = rnd.nextInt(10000).toLong
      (i.toLong, s, s + rnd.nextInt(500))
    }.toDF("id", "st", "en").repartition(9)
    val want = pairs(IntervalJoin.bruteForce(iv, iv, "st", "en",
      col("a_id") < col("b_id"))).sorted
    for (w <- Seq(1L, 7L, 100L, 1000L, 100000L)) {
      val got = pairs(IntervalJoin.overlapJoin(iv, iv, "st", "en", w,
        col("a_id") < col("b_id"))).sorted
      assert(got == want, s"binWidth=$w: ${got.size} vs ${want.size}")
    }
  }

  test("exactly-once emission: multi-bin-spanning pairs are not duplicated") {
    // two long intervals sharing MANY bins at width 10
    val iv = Seq((1L, 0L, 1000L), (2L, 5L, 900L)).toDF("id", "st", "en")
    val got = pairs(IntervalJoin.overlapJoin(iv, iv, "st", "en", 10L,
      col("a_id") < col("b_id")))
    assert(got == Seq((1L, 2L, 895L)))
  }

  test("boundary semantics: endpoints inclusive, adjacency counts, disjoint does not") {
    val iv = Seq((1L, 0L, 10L), (2L, 10L, 20L), (3L, 21L, 30L))
      .toDF("id", "st", "en")
    val got = pairs(IntervalJoin.overlapJoin(iv, iv, "st", "en", 7L,
      col("a_id") < col("b_id")))
    assert(got == Seq((1L, 2L, 0L))) // touch at 10; 3 is disjoint from both
  }

  test("plans as an equi-join on bins, never a CartesianProduct") {
    val iv = (1 to 50).map(i => (i.toLong, i * 10L, i * 10L + 5L))
      .toDF("id", "st", "en")
    val plan = IntervalJoin.overlapJoin(iv, iv, "st", "en", 16L,
        col("a_id") < col("b_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
