package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table: the streaming
  * analogue of the batch q33_events_hourly aggregation.
  *
  * Batch and stream share the SAME transform function — the core
  * Spark-first property: `hourlyAgg` is a plan fragment valid under
  * both execution modes, so correctness is established once (batch
  * oracle) and the streaming test only checks mode parity.
  *
  * Watermarking bounds state: with a 2-hour watermark on `ts`,
  * completed hourly windows are evicted from the state store — at
  * 100 TB/day of events the state held is O(active windows), not
  * O(stream history).
  */
object EventsStream {

  /** events.parquet schema as ORIGINALLY stored (ts = TIMESTAMP(NANOS),
    * which reads as a raw long under nanosAsLong). Fallback only:
    * fixture regenerations have shipped `ts` both as nanos (-> long)
    * and as micros (-> timestamp), so prefer [[storedSchema]], which
    * reads the actual footer.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The directory's actual on-disk schema (one batch footer read —
    * the file-stream source itself requires a user-provided schema);
    * [[rawSchema]] if the dir can't be read yet (not yet populated).
    * Only the expected not-yet-populated shapes fall back — an empty
    * or missing path ([[AnalysisException]]) or a transient IO error
    * listing it; genuine corruption, permission failures surfaced as
    * runtime exceptions, and fatal JVM errors all propagate rather
    * than silently starting the stream on the possibly-wrong
    * [[rawSchema]].
    */
  def storedSchema(spark: SparkSession, dir: String): StructType =
    try spark.read.parquet(dir).schema
    catch {
      case _: org.apache.spark.sql.AnalysisException => rawSchema
      case _: java.io.FileNotFoundException => rawSchema
    }

  /** Normalize `ts` to a proper timestamp whatever the stored form:
    * ns-long (nanosAsLong) truncates to µs — the same truncation
    * DuckDB applies on read — and a native timestamp passes through.
    * Shared by batch and stream paths (mirrors `queries.events`).
    */
  def withTimestamp(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }

  /** Tumbling 1-hour aggregation, mode-agnostic. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        col("sum_value"))

  /** SLIDING 1-hour windows on a 15-minute slide, mode-agnostic (the
    * q123 shape): each event contributes to exactly four overlapping
    * windows; under streaming the watermark closes a window 2 hours
    * after its end, so state is O(open windows x slide density).
    */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("wstart"), col("n_events"))

  /** Streaming read over a DIRECTORY of events parquet files (the
    * file-stream source tails the directory for new files — the batch
    * fixture file must be staged into one).
    */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    withTimestamp(spark.readStream.schema(storedSchema(spark, dir)).parquet(dir))

  /** The streaming hourly aggregation with watermarked state. */
  def hourlyStream(spark: SparkSession, dir: String): DataFrame =
    hourlyAgg(readStream(spark, dir).withWatermark("ts", "2 hours"))

  /** Exact dedup by event id, mode-agnostic: in streaming mode the
    * duplicates are dropped across micro-batches through the state
    * store, and the watermark bounds that state — ids older than the
    * horizon are evicted, so state is O(events within the watermark),
    * not O(stream history). The at-least-once file/queue sources this
    * feeds from make a dedup stage the standard first hop of a
    * production ingest (the streaming analogue of O-15).
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events.dropDuplicatesWithinWatermark(Seq("event_id"))

  /** The streaming dedup with watermarked state. */
  def dedupStream(spark: SparkSession, dir: String,
                  delay: String = "48 hours"): DataFrame =
    dedupEvents(readStream(spark, dir).withWatermark("ts", delay))

  /** Funnel interval join (click -> purchase by the same user within
    * one hour), mode-agnostic — the streaming analogue of
    * q81_funnel_pairs. As a stream-stream join the range condition
    * bounds both state stores: with watermarked inputs, clicks older
    * than watermark−1h and purchases older than watermark are evicted,
    * so state is O(events in the join window), not O(stream history).
    */
  def funnelPairs(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.alias("c").join(purchases.alias("p"),
        expr("""c.user_id = p.user_id AND p.ts > c.ts
                AND p.ts <= c.ts + interval 1 hour"""))
      .select(col("c.user_id"), col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"))

  /** The streaming funnel with watermarked two-sided state. */
  def funnelStream(spark: SparkSession, dir: String): DataFrame = {
    val ev = readStream(spark, dir)
    funnelPairs(
      ev.where(col("event_type") === "click").withWatermark("ts", "2 hours"),
      ev.where(col("event_type") === "purchase").withWatermark("ts", "2 hours"))
  }
}
