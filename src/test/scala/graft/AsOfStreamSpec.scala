package graft

import java.sql.Timestamp

import graft.ops.AsOf
import graft.streaming.AsOfStream
import graft.streaming.AsOfStream.Tagged
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the watermarked as-of join: the streaming fold
  * must emit, for every left event, exactly the match the NATIVE
  * batch operator ([[graft.plans.AsOfJoinPlan]] via
  * `AsOf.joinAsOfNative`) computes over the complete input — across
  * arbitrary micro-batch splits, including tolerance expiry. The
  * flush key (Long.MaxValue) only advances the watermark and is
  * excluded from both sides of the compare.
  */
class AsOfStreamSpec extends SparkSpec {
  import spark.implicits._

  private val FlushKey = Long.MaxValue

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  private def left(key: Long, sec: Long, v: Long): Tagged[Long, Long] =
    Tagged(key, ts(sec), Some(v), None)
  private def right(key: Long, sec: Long, v: Long): Tagged[Long, Long] =
    Tagged(key, ts(sec), None, Some(v))
  private def flush(sec: Long): Tagged[Long, Long] =
    Tagged(FlushKey, ts(sec), None, Some(0L))

  /** Runs the stream over the given micro-batches and returns the
    * emitted (key, tsUs, left, right) rows, flush key dropped. The
    * watermark delay is the caller's lateness contract: batches that
    * carry rows older than (previous max event time - delay) violate
    * it and Spark drops them — so split-invariance tests either split
    * in event-time order (delay 0) or allow the full disorder
    * (large delay).
    */
  private def runStream(batches: Seq[Seq[Tagged[Long, Long]]],
                        toleranceUs: Option[Long],
                        delay: String = "0 seconds")
      : Seq[(Long, Long, Long, Option[Long])] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Tagged[Long, Long]]
    val tagged = mem.toDS().withWatermark("eventTime", delay)
    val name = s"asof_out_${System.nanoTime()}"
    val q = AsOfStream.joinAsOf(tagged, toleranceUs)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).where(col("key") =!= FlushKey)
      .select(col("key"), col("tsUs"), col("left"), col("right"))
      .as[(Long, Long, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._2, r._3)).toSeq
  }

  /** The same input through the native batch operator. */
  private def runBatch(rows: Seq[Tagged[Long, Long]],
                       toleranceUs: Option[Long])
      : Seq[(Long, Long, Long, Option[Long])] = {
    val l = rows.filter(t => t.left.isDefined && t.key != FlushKey)
      .map(t => (t.key, t.eventTime.getTime * 1000L, t.left.get))
      .toDF("key", "tsUs", "lv")
    val r = rows.filter(t => t.right.isDefined && t.key != FlushKey)
      .map(t => (t.key, t.eventTime.getTime * 1000L, t.right.get))
      .toDF("key", "tsUs", "rv")
    AsOf.joinAsOfNative(l, r, "key", "tsUs", "tsUs", Seq("rv"),
        tolerance = toleranceUs)
      .select(col("key"), col("tsUs"), col("lv"), col("rv_asof"))
      .as[(Long, Long, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._2, r._3)).toSeq
  }

  // lefts at 10..60, rights interleaved, two keys with different
  // histories; final flush row far in the future drains every left
  private val input: Seq[Tagged[Long, Long]] = Seq(
    right(1L, 5, 100), left(1L, 10, 1), right(1L, 12, 101),
    left(1L, 20, 2), left(1L, 21, 3), right(1L, 21, 102),
    left(2L, 15, 4), right(2L, 30, 200), left(2L, 35, 5),
    left(3L, 40, 6), // key with no rights at all
    left(1L, 60, 7))

  test("stream == native batch over one micro-batch (plus flush)") {
    val got = runStream(Seq(input, Seq(flush(1000))), None)
    assert(got == runBatch(input, None) && got.nonEmpty)
  }

  test("stream == native batch across every in-order two-way split") {
    // delay 0: the watermark tracks max event time, so splits must be
    // in event-time order (the contract a 0-lateness stream declares)
    val sorted = input.sortBy(_.eventTime.getTime)
    val whole = runBatch(sorted, None)
    // a cut between two rows with EQUAL event time violates the
    // 0-delay contract (Spark drops arrivals at ts == watermark), so
    // only strictly-increasing boundaries are valid splits here; the
    // tie case is covered by the covering-delay test below
    (1 until sorted.length).foreach { cut =>
      if (sorted(cut - 1).eventTime.getTime < sorted(cut).eventTime.getTime) {
        val got = runStream(
          Seq(sorted.take(cut), sorted.drop(cut), Seq(flush(1000))), None)
        assert(got == whole, s"split at $cut diverged")
      }
    }
  }

  test("out-of-order splits under a covering watermark delay") {
    // delay 100s covers the input's full disorder: nothing is dropped,
    // everything pends in state until the flush drains it — the
    // cross-batch buffering path
    val whole = runBatch(input, None)
    (1 until input.length by 2).foreach { cut =>
      val got = runStream(
        Seq(input.take(cut), input.drop(cut), Seq(flush(1000))), None,
        delay = "100 seconds")
      assert(got == whole, s"unordered split at $cut diverged")
    }
  }

  test("tolerance expiry matches the batch operator across splits") {
    val tol = Some(8L * 1000000L) // 8s staleness bound
    val sorted = input.sortBy(_.eventTime.getTime)
    val whole = runBatch(sorted, tol)
    // sanity: the bound actually bites somewhere (left at 20 vs right
    // at 12 is exactly 8s — inclusive; left at 60 vs right at 21 is
    // stale)
    assert(whole.exists(_._4.isEmpty) && whole.exists(_._4.isDefined))
    Seq(3, 6, 9).foreach { cut =>
      // same boundary-tie rule as above: shift off equal-ts cuts
      val c = if (sorted(cut - 1).eventTime.getTime <
          sorted(cut).eventTime.getTime) cut else cut + 1
      val got = runStream(
        Seq(sorted.take(c), sorted.drop(c), Seq(flush(1000))), tol)
      assert(got == whole, s"tolerance split at $c diverged")
    }
  }

  test("per-key state keeps one dominant right below the watermark") {
    // after many rights and a flush, a later left still matches the
    // LATEST old right (dominance pruning must not over-prune)
    val rows = Seq(right(1L, 1, 10), right(1L, 2, 11), right(1L, 3, 12))
    val lateLeft = Seq(left(1L, 500, 9))
    val got = runStream(Seq(rows, Seq(flush(400)), lateLeft,
      Seq(flush(1000))), None)
    assert(got == Seq((1L, 500L * 1000000L, 9L, Some(12L))))
  }
}
