package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Positional inverted index + exact phrase search — the retrieval
  * layer underneath bag-of-words ranking (q115's BM25 scores docs but
  * cannot answer "these words ADJACENT, in this order").
  *
  * Posting layout: one row per (term, doc) carrying tf and the sorted
  * POSITIONS array — rows = postings, not occurrences, so the index
  * is |vocab x docs containing| sized and each probe explodes only
  * the phrase terms' position lists. On disk the index is
  * hive-partitioned by `bucket` = a stable hash of the term into
  * `nBuckets` directories: `partitionBy(term)` would create a
  * directory per vocabulary word (millions at corpus scale — a
  * metadata bomb), while term-hash bucketing keeps the directory
  * count fixed and still lets a probe read ONLY the phrase terms'
  * buckets (static partition prune) with the exact `term IN (...)`
  * filter pushed into the parquet scan inside them.
  *
  * Phrase matching is the classic positional-join: occurrence i of
  * the phrase anchors at position p iff term_i appears at p + i, so
  * each term's postings shift by -i onto a shared `anchor` key and
  * the phrase is an n-way equi-join on (doc, anchor) — no regex over
  * the raw text, no re-scan of the corpus. Every join is keyed the
  * same way, so one shuffle partitioning serves the whole chain (and
  * phrase-term postings are a vanishing fraction of the index).
  */
object InvertedIndex {

  /** Number of hash buckets the on-disk layout uses; a probe prunes
    * to the phrase terms' buckets.
    */
  val DefaultBuckets = 64

  private def bucketOf(term: org.apache.spark.sql.Column, n: Int) =
    pmod(xxhash64(term), lit(n.toLong)).cast("int")

  /** Build the positional postings frame: (term, bucket, doc, tf,
    * positions — 0-based, sorted).
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
            nBuckets: Int = DefaultBuckets): DataFrame =
    docs.select(col(idCol).as("doc"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "term")))
      .groupBy("term", "doc")
      .agg(count(lit(1)).as("tf"), sort_array(collect_list("pos")).as("positions"))
      .withColumn("bucket", bucketOf(col("term"), nBuckets))

  /** Materialize the index, hive-partitioned by term-hash bucket. */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
                 path: String, nBuckets: Int = DefaultBuckets): Unit =
    build(docs, idCol, textCol, nBuckets)
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Exact phrase occurrences per document from a postings frame:
    * (doc, n_occurrences), docs with zero occurrences absent.
    */
  def phraseFromPostings(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val anchors = phrase.zipWithIndex.map { case (t, i) =>
      postings.where(col("term") === t)
        .select(col("doc"), explode(col("positions")).as("p"))
        .select(col("doc"), (col("p") - i).as("anchor"))
    }
    anchors.reduce((a, b) => a.join(b, Seq("doc", "anchor")))
      .groupBy("doc").agg(count(lit(1)).as("n_occurrences"))
  }

  /** In-memory phrase search (build + match in one plan). */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame =
    phraseFromPostings(build(docs, idCol, textCol), phrase)

  /** Phrase search against a MATERIALIZED index: reads only the
    * phrase terms' buckets (static partition prune) with the exact
    * term set pushed into the scan.
    */
  def phraseSearchIndex(spark: SparkSession, path: String,
                        phrase: Seq[String],
                        nBuckets: Int = DefaultBuckets): DataFrame = {
    // bucket ids are a pure driver-side function of the phrase — no
    // corpus access, so the prune is static (literal IN list)
    val spark2 = spark
    import spark2.implicits._
    val buckets = phrase.toDF("term")
      .select(bucketOf(col("term"), nBuckets)).as[Int].collect()
      .toSeq.distinct.sorted
    val postings = spark.read.parquet(path)
      .where(col("bucket").isin(buckets.map(Integer.valueOf): _*))
      .where(col("term").isin(phrase: _*))
    phraseFromPostings(postings, phrase)
  }
}
