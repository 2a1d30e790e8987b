package graft

import java.sql.Timestamp

import graft.ops.IntervalJoin
import graft.streaming.IntervalJoinStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream == batch for the watermarked interval-overlap join: the
  * native stream-stream join with the bounded start-to-start range
  * condition must emit exactly the batch overlap pairs, across
  * micro-batch splits, with the length contract enforced loudly.
  */
class IntervalJoinStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  // (id, start, end) interval fixtures; lengths <= 10s. Shifted off
  // the epoch origin: Spark's initial watermark is epoch 0 and rows
  // AT the watermark are dropped as late, so a start of exactly 0
  // would vanish for harness reasons, not operator ones.
  private val base = 1000L
  private val lefts = Seq(
    (1L, 0L, 5L), (2L, 4L, 9L), (3L, 20L, 29L), (4L, 100L, 104L))
    .map { case (i, s, e) => (i, s + base, e + base) }
  private val rights = Seq(
    (10L, 3L, 8L), (11L, 9L, 12L), (12L, 25L, 33L), (13L, 50L, 52L))
    .map { case (i, s, e) => (i, s + base, e + base) }

  private def batchTruth: Seq[(Long, Long, Long)] = {
    val a = lefts.map { case (i, s, e) => (i, s * 1000000L, e * 1000000L) }
      .toDF("id", "s", "e")
    val b = rights.map { case (i, s, e) => (i, s * 1000000L, e * 1000000L) }
      .toDF("id", "s", "e")
    IntervalJoin.bruteForce(a, b, "s", "e")
      .select(col("a_id"), col("b_id"), col("overlap_us"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
  }

  private def runStream(leftBatches: Seq[Seq[(Long, Long, Long)]],
                        rightBatches: Seq[Seq[(Long, Long, Long)]])
      : Seq[(Long, Long, Long)] = {
    implicit val sq = spark.sqlContext
    val memA = MemoryStream[(Long, Long, Long)]
    val memB = MemoryStream[(Long, Long, Long)]
    def frame(m: MemoryStream[(Long, Long, Long)]) =
      m.toDS().toDF("id", "s0", "e0")
        .select(col("id"), expr("timestamp_seconds(s0)").as("s"),
          expr("timestamp_seconds(e0)").as("e"))
    val joined = IntervalJoinStream.overlapJoin(
      frame(memA), frame(memB), "s", "e", maxLenSec = 10L,
      delay = "0 seconds")
    val name = s"ivj_out_${System.nanoTime()}"
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      leftBatches.zipAll(rightBatches, Seq.empty, Seq.empty)
        .foreach { case (la, rb) =>
          if (la.nonEmpty) { memA.addData(la); () }
          if (rb.nonEmpty) { memB.addData(rb); () }
          q.processAllAvailable()
        }
    } finally q.stop()
    spark.table(name).select(col("a_id"), col("b_id"), col("overlap_us"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
  }

  test("stream == batch brute force, both sides in one batch") {
    assert(runStream(Seq(lefts), Seq(rights)) == batchTruth &&
      batchTruth.nonEmpty)
  }

  test("stream == batch across interleaved micro-batch splits") {
    // left arrives in 2 batches, right in 3, in event-time order
    val got = runStream(
      Seq(lefts.take(2), lefts.drop(2), Seq.empty),
      Seq(rights.take(1), rights.slice(1, 3), rights.drop(3)))
    assert(got == batchTruth)
  }

  test("an over-long interval fails the query instead of losing matches") {
    implicit val sq = spark.sqlContext
    val memA = MemoryStream[(Long, Long, Long)]
    val memB = MemoryStream[(Long, Long, Long)]
    def frame(m: MemoryStream[(Long, Long, Long)]) =
      m.toDS().toDF("id", "s0", "e0")
        .select(col("id"), expr("timestamp_seconds(s0)").as("s"),
          expr("timestamp_seconds(e0)").as("e"))
    val joined = IntervalJoinStream.overlapJoin(
      frame(memA), frame(memB), "s", "e", maxLenSec = 10L,
      delay = "0 seconds")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(s"ivj_bad_${System.nanoTime()}").start()
    try {
      memA.addData(Seq((1L, 0L, 60L))) // 60s > maxLen 10s
      memB.addData(Seq((2L, 1L, 2L)))
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(String.valueOf(err.getCause).contains("split long intervals"),
        s"unexpected: ${err.getCause}")
    } finally q.stop()
  }
}
