package graft

import graft.streaming.EventsStream

class StreamingSpec extends SparkSpec {

  test("streaming hourly agg matches the batch plan over the same data") {
    // batch side: same transform over a batch read
    val batch = EventsStream.hourlyAgg(
      EventsStream.withTimestamp(
        spark.read.schema(EventsStream.rawSchema)
          .parquet("/root/testdata/sf0.001/events.parquet")))
      .orderBy("hour", "event_type")
      .collect()

    // stage the fixture file into a directory (file-stream source
    // requires a directory to tail)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))

    // stream side: complete-mode memory sink, drained synchronously
    val q = EventsStream.hourlyStream(spark, dir.toString)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .orderBy("hour", "event_type").collect()
      assert(streamed.length == batch.length)
      assert(streamed.sameElements(batch))
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event ids across micro-batches") {
    // the same fixture staged TWICE: every event id arrives in two
    // different files; maxFilesPerTrigger=1 forces separate
    // micro-batches, so the drop happens through the state store
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dedup")
    Seq("a", "b").foreach { n =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        dir.resolve(s"events_$n.parquet"))
    }

    val src = spark.readStream.schema(EventsStream.rawSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val deduped = EventsStream.dedupEvents(
      EventsStream.withTimestamp(src).withWatermark("ts", "3650 days"))

    val q = deduped.select("event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try {
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getLong(0)).sorted
      val expected = spark.read.schema(EventsStream.rawSchema)
        .parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id").distinct().collect().map(_.getLong(0)).sorted
      assert(ids.length == expected.length, "one survivor per event id")
      assert(ids.sameElements(expected))
    } finally q.stop()
  }

  test("stream-stream funnel join matches the batch plan over the same data") {
    val batchEv = EventsStream.withTimestamp(
      spark.read.schema(EventsStream.rawSchema)
        .parquet("/root/testdata/sf0.001/events.parquet"))
    val batch = EventsStream.funnelPairs(
        batchEv.where("event_type = 'click'"),
        batchEv.where("event_type = 'purchase'"))
      .orderBy("user_id", "click_id", "purchase_id").collect()

    val dir = java.nio.file.Files.createTempDirectory("graft_stream_funnel")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))

    val q = EventsStream.funnelStream(spark, dir.toString)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("funnel_out")
        .orderBy("user_id", "click_id", "purchase_id").collect()
      assert(streamed.length == batch.length)
      assert(streamed.sameElements(batch))
    } finally q.stop()
  }
}
