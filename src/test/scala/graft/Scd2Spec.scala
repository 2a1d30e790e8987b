package graft

import graft.ops.ChangeCapture
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def log(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "tsm", "event_id", "state")
      .withColumn("ts", timestamp_millis(col("tsm"))).drop("tsm")

  private def run(df: org.apache.spark.sql.DataFrame) =
    ChangeCapture.scd2(df, "user_id", "ts", "event_id", Seq("state"))
      .select(col("user_id"), col("state"),
        unix_millis(col("valid_from")).as("from_ms"),
        unix_millis(col("valid_to")).as("to_ms"), col("is_current"))
      .as[(Long, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq

  test("consecutive duplicate states collapse; intervals chain shut") {
    val got = run(log(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 40L, 4L, "A"),
      (2L, 15L, 5L, "X")))
    assert(got == Seq(
      (1L, "A", 10L, Some(30L), false),
      (1L, "B", 30L, Some(40L), false),
      (1L, "A", 40L, None, true),
      (2L, "X", 15L, None, true)))
  }

  test("same-timestamp changes are ordered by the tie column, deterministically") {
    val rows = log((1L, 10L, 2L, "B"), (1L, 10L, 1L, "A"), (1L, 20L, 3L, "C"))
    val got = run(rows)
    assert(got == Seq(
      (1L, "A", 10L, Some(10L), false),
      (1L, "B", 10L, Some(20L), false),
      (1L, "C", 20L, None, true)))
    assert(run(rows.repartition(7)) == got)
  }

  test("one Exchange serves both window passes") {
    val df = log((1L, 10L, 1L, "A"), (1L, 20L, 2L, "B"))
    val plan = ChangeCapture.scd2(df, "user_id", "ts", "event_id", Seq("state"))
      .queryExecution.executedPlan.toString
    val exchanges = "(?i)Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$plan")
  }

  test("null states participate in null-safe change detection") {
    val rows = Seq(
      (1L, 10L, 1L, Some("A")), (1L, 20L, 2L, None),
      (1L, 30L, 3L, None), (1L, 40L, 4L, Some("A")))
      .toDF("user_id", "tsm", "event_id", "state")
      .withColumn("ts", timestamp_millis(col("tsm"))).drop("tsm")
    val got = ChangeCapture.scd2(rows, "user_id", "ts", "event_id", Seq("state"))
      .select(col("state"), unix_millis(col("valid_from")).as("f"))
      .as[(Option[String], Long)].collect().sortBy(_._2).toSeq
    // A -> null (one interval, not two) -> A
    assert(got == Seq((Some("A"), 10L), (None, 20L), (Some("A"), 40L)))
  }
}
