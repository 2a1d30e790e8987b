package graft

import graft.functions.{GramHashes, MinHashShingles, SurvivingGrams}
import org.apache.spark.sql.functions._

class GramHashesSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("tk"))

  test("GramHashes and MinHashShingles share one hash family") {
    // the documented contract: MinHashShingles' h0 (KM family j=0) is
    // the minimum of GramHashes' low 32 bits over the same windows —
    // pinned so the two expressions can never silently diverge
    val rows = docs.where(size(col("tk")) >= 3)
      .withColumn("ghs", GramHashes.gramHashArray(col("tk"), 3))
      .withColumn("mhs", MinHashShingles.minhashArray(col("tk"), 8, 3))
      .select(
        expr("array_min(transform(ghs, h -> h & 4294967295))").as("viaGrams"),
        element_at(col("mhs"), 1).as("viaMinhash"))
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (g, m) => assert(g == m) }
  }

  test("GramHashes: window count and sub-width nulls") {
    val r = Seq((1L, "a b c d e"), (2L, "a b")).toDF("id", "text")
      .select(col("id"), split(col("text"), " ").as("tk"))
      .withColumn("ghs", GramHashes.gramHashArray(col("tk"), 3))
      .select(col("id"), col("ghs"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(r(1L).get.length == 3) // 5 tokens, width 3 -> 3 windows
    assert(r(2L).isEmpty)         // too short to shingle -> null
  }

  test("SurvivingGrams: all-pass bloom gives distinct grams, empty bloom gives none") {
    val sc = spark.sparkContext
    val d = Seq((1L, "x y z x y z x y w")).toDF("id", "text")
      .select(col("id"), split(col("text"), " ").as("tk"))
    // a bloom holding every true window hash: no false negatives means
    // the surviving set must be EXACTLY the distinct grams
    val full = org.apache.spark.util.sketch.BloomFilter.create(100L, 0.01)
    d.select(explode(GramHashes.gramHashArray(col("tk"), 3)).as("h"))
      .as[Long].collect().foreach(full.putLong)
    val empty = org.apache.spark.util.sketch.BloomFilter.create(1000L, 0.001)
    val (bFull, bEmpty) = (sc.broadcast(full), sc.broadcast(empty))
    val viaSurviving = d
      .select(explode(SurvivingGrams.survivingGrams(col("tk"), 3, bFull)).as("sh"))
      .as[String].collect().sorted.toSeq
    val viaStrings = d
      .select(explode(array_distinct(expr(graft.ops.Dedup.shingleExpr(3)))).as("sh"))
      .as[String].collect().sorted.toSeq
    assert(viaSurviving == viaStrings && viaStrings.size == 4)

    assert(d.select(explode(SurvivingGrams.survivingGrams(col("tk"), 3, bEmpty)))
      .count() == 0L)
  }

  test("bloom probe expression agrees with the filter it wraps") {
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(100L, 0.01)
    Seq(3L, 7L, 42L).foreach(bloom.putLong)
    val bc = spark.sparkContext.broadcast(bloom)
    val got = spark.range(50)
      .where(graft.functions.BloomMightContainLong.mightContain(col("id"), bc))
      .as[Long].collect().toSet
    val expect = (0L until 50L).filter(bloom.mightContainLong).toSet
    assert(got == expect && Set(3L, 7L, 42L).subsetOf(got))
  }
}
