package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch 20x probe for the round's hot ops (containment join, span
  * scrub) — same corpus recipe as BenchScale's docs_gram, timed alone.
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "20").toInt
    val tmp = Files.createTempDirectory("graft_probe_scale").toString
    def replicate(df: DataFrame, times: Int, keyCols: Seq[String]): DataFrame = {
      val rep = spark.range(times).select(col("id").as("rep__"))
      keyCols.foldLeft(df.crossJoin(rep)) { (d, k) =>
        d.withColumn(k, col(k) * times + col("rep__"))
      }.drop("rep__")
    }
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val parts = spark.sparkContext.defaultParallelism * 2
    val gramTimes = scale * 5
    replicate(docs.select("doc_id", "text"), gramTimes, Seq("doc_id"))
      .repartition(parts)
      .select(col("doc_id"), expr(
        s"""concat_ws(' ', transform(split(text, ' '),
           |  (t, i) -> IF(i % 7 = (doc_id % $gramTimes) % 7,
           |    concat(t, '~', doc_id % $gramTimes), t)))""".stripMargin).as("text"))
      .write.mode("overwrite").parquet(s"$tmp/docs_gram.parquet")
    val dg = spark.read.parquet(s"$tmp/docs_gram.parquet")
    println("PROBESCALE docs=" + dg.count())
    def time[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBESCALE $name%-32s ${(System.nanoTime() - t0) / 1e9}%9.3f s")
    }
    time("containment_candidates") {
      println("  cand=" + graft.ops.PrefixJoin.containmentCandidates(
        dg, "doc_id", "text", 3, 700).count())
    }
    time("containment_prefix_join") {
      println("  out=" + graft.ops.PrefixJoin.containmentSelfJoin(
        dg, "doc_id", "text", 3, 700).count())
    }
    time("span_scrub") {
      graft.ops.SpanScrub.dupSpanStats(dg, "doc_id",
          "split(lower(trim(text)), '\\\\s+')", n = 5)
        .agg(sum(col("n_masked"))).collect()
    }
    spark.stop()
  }
}
