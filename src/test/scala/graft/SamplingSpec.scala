package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("membership is content-addressed: stable under repartitioning and reruns") {
    val a = Sampling.deterministicSample(docs, "doc_id", 200)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.deterministicSample(docs.repartition(7), "doc_id", 200)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty && a.length < 500)

    // consistency across tables sharing the key: sample-then-join ==
    // join-then-sample (the property RNG samplers lack)
    val other = docs.select(col("doc_id"), col("lang"))
    val joinThenSample = Sampling.deterministicSample(
      docs.join(other, "doc_id"), "doc_id", 200).count()
    val sampleThenJoin = Sampling.deterministicSample(docs, "doc_id", 200)
      .join(Sampling.deterministicSample(other, "doc_id", 200), "doc_id").count()
    assert(joinThenSample == sampleThenJoin)
  }

  test("stratified rates are honored per stratum") {
    val s = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 300, "de" -> 1000), defaultMilli = 0)
    val byLang = s.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("de") == total("de"))          // rate 1000 = keep all
    assert(!byLang.contains("fr"))               // default 0 = drop all
    val enRate = byLang("en").toDouble / total("en")
    assert(enRate > 0.15 && enRate < 0.45, s"en rate $enRate")  // ~0.3
  }
}
