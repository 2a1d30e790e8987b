package graft

import graft.ops.Sampling
import graft.streaming.WeightedReservoirStream
import org.apache.spark.sql.functions._

class WeightedReservoirStreamSpec extends SparkSpec {
  import spark.implicits._

  test("cumulative stream reservoir == batch sampler over the distinct union, despite redelivery") {
    val dir = java.nio.file.Files.createTempDirectory("graft_resv_stream")
    // three micro-batches: first + second halves of the fixture, then
    // the FIRST file again — an at-least-once redelivery
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("n_tokens",
        expr("size(split(lower(trim(text)), '\\\\s+'))").cast("long"))
    docs.where(col("doc_id") % 2 === 0).coalesce(1)
      .write.parquet(dir.resolve("half_a").toString)
    docs.where(col("doc_id") % 2 === 1).coalesce(1)
      .write.parquet(dir.resolve("half_b").toString)
    val streamDir = dir.resolve("in"); java.nio.file.Files.createDirectory(streamDir)
    def stage(src: String, as: String): Unit = {
      val part = new java.io.File(dir.resolve(src).toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, streamDir.resolve(as))
    }
    stage("half_a", "b1.parquet")
    stage("half_b", "b2.parquet")
    stage("half_a", "b3_redelivered.parquet")

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
    val resv = new WeightedReservoirStream("lang", "doc_id", "n_tokens", k = 20)
    val q = resv.attach(stream)
    try q.processAllAvailable() finally q.stop()

    val expect = Sampling
      .weightedSamplePerGroup(docs, "lang", "doc_id", "n_tokens", k = 20)
      .select(col("lang"), col("rnk"), col("doc_id").cast("string"),
        col("n_tokens"))
      .as[(String, Long, String, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(resv.sample() == expect)
  }

  test("reservoir state is bounded at k per group") {
    val resv = new WeightedReservoirStream("g", "k", "w", k = 3)
    val batch = (1 to 100).map(i => ("only", i.toLong, (i % 7 + 1).toLong))
      .toDF("g", "k", "w")
    resv.addBatch(batch)
    resv.addBatch(batch)
    val got = resv.sample()
    assert(got.size == 3)
    assert(got.map(_._2) == Seq(1L, 2L, 3L))
  }
}
