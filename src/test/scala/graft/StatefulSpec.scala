package graft

import graft.streaming.{EventsStream, StatefulSessions}
import graft.functions.MomentsAggregator
import org.apache.spark.sql.functions._

class StatefulSessionsSpec extends SparkSpec {

  test("streaming stateful sessionizer agrees with the batch window sessionizer") {
    // stage events into a streamable dir
    val dir = java.nio.file.Files.createTempDirectory("graft_state")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))

    val stream = EventsStream.readStream(spark, dir.toString)
    val q = StatefulSessions.sessionize(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      q.processAllAvailable()
      // with the whole fixture in ONE micro-batch, every session except
      // each user's last (still open in state) must match the batch
      // sessionizer's output
      val streamed = spark.table("sessions_out")
      val batch = SparkEntry.queries("q53_sessionize")(spark, "/root/testdata/sf0.001")
      val batchClosed = batch.withColumn("rk",
          org.apache.spark.sql.expressions.Window.partitionBy("user_id") match {
            case w => max("sess").over(w)
          })
        .where(col("sess") < col("rk")) // drop each user's final session
        .select(col("user_id"), col("n_events"))
      val streamedCmp = streamed.select(col("user_id"), col("n_events"))
      assert(streamedCmp.exceptAll(batchClosed).isEmpty &&
        batchClosed.exceptAll(streamedCmp).isEmpty)
      assert(streamed.count() > 0)
    } finally q.stop()
  }
}

class MomentsAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed Aggregator variance matches the exact decimal formulation") {
    val vals = Seq(1.25, 2.50, 3.75, 10.00, 4.25)
    val ds = vals.toDS()
    val out = ds.select(MomentsAggregator.centMoments.toColumn).head()
    val n = vals.size
    val s1 = vals.sum
    val s2 = vals.map(v => v * v).sum
    assert(out.n == n)
    assert(math.abs(out.mean - s1 / n) < 1e-12)
    assert(math.abs(out.variance - (s2 - s1 * s1 / n) / (n - 1)) < 1e-9)
  }

  test("Aggregator works grouped over the fixture") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val grouped = li.select(col("l_returnflag"), col("l_quantity"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .agg(MomentsAggregator.centMomentsOf[(String, Double)](_._2).toColumn)
      .collect().toMap
    // cross-check against q58's exact-decimal variance
    val oracle = SparkEntry.queries("q58_exact_moments")(
      spark, "/root/testdata/sf0.001")
      .select("l_returnflag", "var_qty").as[(String, Double)].collect().toMap
    oracle.foreach { case (flag, varExp) =>
      assert(math.abs(grouped(flag).variance - varExp) < 1e-6,
        s"flag $flag: ${grouped(flag).variance} vs $varExp")
    }
  }
}
