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
}
