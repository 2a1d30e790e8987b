package graft

import graft.ops.{Dedup, LshIndex}
import graft.streaming.NearDupStream
import org.apache.spark.sql.functions._

class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    .select("doc_id", "text")

  private val truncText =
    expr("concat_ws(' ', slice(split(lower(trim(text)), '\\\\s+'), 1, " +
      "greatest((size(split(lower(trim(text)), '\\\\s+')) * 4) div 5, 1)))")

  test("probe against the persisted index equals direct band-key intersection") {
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val batch = docs.where(col("doc_id") % 2 =!= 0)
      .unionAll(corpus.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), truncText.as("text")))
    val cSig = Dedup.minhashSignaturesFast(corpus, "doc_id", "text", 8, 3)
    val bSig = Dedup.minhashSignaturesFast(batch, "doc_id", "text", 8, 3)

    val path = java.nio.file.Files.createTempDirectory("graft_lshidx").toString + "/idx"
    LshIndex.write(cSig, "doc_id", bands = 4, rowsPerBand = 2, path)

    val got = LshIndex.probe(spark, path, bSig, "doc_id", 4, 2)
      .as[(Long, Long)].collect().sorted.toSeq

    // independent recomputation: batch keys x corpus keys, no index
    val ck = Dedup.bandKeys(cSig, "doc_id", 4, 2)
      .withColumnRenamed("doc_id", "corpus_id")
    val bk = Dedup.bandKeys(bSig, "doc_id", 4, 2)
      .withColumnRenamed("doc_id", "batch_id")
    val expected = bk.join(ck, Seq("band", "bandsig"))
      .where(col("batch_id") =!= col("corpus_id"))
      .select("batch_id", "corpus_id").distinct()
      .as[(Long, Long)].collect().sorted.toSeq

    assert(got == expected)
    // the planted near-dups were all caught
    val flaggedIds = got.map(_._1).toSet
    val plantIds = batch.where(col("doc_id") >= 1000000L)
      .select("doc_id").as[Long].collect().toSet
    assert(plantIds.subsetOf(flaggedIds), "every plant should collide")
  }

  test("oversized buckets are dropped at build time") {
    // two docs sharing text => identical signatures => 4 shared buckets
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val sig = Dedup.minhashSignaturesFast(corpus, "doc_id", "text", 8, 3)
    val path = java.nio.file.Files.createTempDirectory("graft_lshcap").toString + "/idx"
    LshIndex.write(sig, "doc_id", 4, 2, path, maxBucketSize = 1)
    val kept = spark.read.parquet(path).select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(kept == Set(3L)) // the duplicate pair's buckets (size 2) dropped
  }

  test("compact re-enforces the bucket cap after appends regrow a bucket") {
    val dup = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val more = Seq((2L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_lshcompact")
      .toString + "/idx"
    LshIndex.write(Dedup.minhashSignaturesFast(dup, "doc_id", "text", 8, 3),
      "doc_id", 4, 2, path, maxBucketSize = 1)
    // append regrows the duplicate bucket past the cap
    LshIndex.append(Dedup.minhashSignaturesFast(more, "doc_id", "text", 8, 3),
      "doc_id", 4, 2, path)
    assert(spark.read.parquet(path).select("doc_id").distinct().count() == 3L)
    LshIndex.compact(spark, path, maxBucketSize = 1)
    val kept = spark.read.parquet(path).select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(kept == Set(3L)) // the regrown size-2 buckets dropped
  }

  test("streaming near-dup loop: cross-batch AND in-batch plants quarantined, clean docs indexed") {
    val base = java.nio.file.Files.createTempDirectory("graft_ndstream").toString
    val (idx, out, dup) = (s"$base/idx", s"$base/out", s"$base/dup")
    val b1 = docs.where(col("doc_id") < 250)
    // batch 2 carries plants of batch-1 docs (cross-batch dups) AND
    // plants of its own docs (+2M ids — in-batch dups, higher id loses)
    val b2 = docs.where(col("doc_id") >= 250)
      .unionAll(b1.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), truncText.as("text")))
      .unionAll(docs.where(col("doc_id") >= 250 && col("doc_id") % 10 === 3)
        .select((col("doc_id") + 2000000L).as("doc_id"), truncText.as("text")))
      // one doc too short to shingle: must pass through, not vanish
      .unionAll(Seq((3000000L, "tiny")).toDF("doc_id", "text"))

    NearDupStream.applyBatch(b1, "doc_id", "text", 8, 3, 4, 2, idx, out, dup)
    NearDupStream.applyBatch(b2, "doc_id", "text", 8, 3, 4, 2, idx, out, dup)

    val dupIds = spark.read.parquet(dup).select("doc_id").as[Long].collect().toSet
    val outIds = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    val plantIds = b2.where(col("doc_id") >= 1000000L && col("doc_id") < 3000000L)
      .select("doc_id").as[Long].collect().toSet
    assert(plantIds.subsetOf(dupIds), "cross-batch AND in-batch plants quarantined")
    // keeper ordering is sound: every quarantined doc lost to a
    // strictly lower id (its collision evidence), so the lowest id of
    // any collision chain always survives
    val evidence = spark.read.parquet(dup)
      .select("doc_id", "first_corpus_id").as[(Long, Long)].collect()
    assert(evidence.forall { case (id, ev) => ev < id }, "evidence < doc_id")
    // each in-batch plant's evidence is at most its own original
    evidence.filter(_._1 >= 2000000L).foreach { case (id, ev) =>
      assert(ev <= id - 2000000L, s"plant $id evidence $ev")
    }
    assert((dupIds & outIds).isEmpty, "no doc in both outputs")
    assert((dupIds | outIds) == (b1.select("doc_id").as[Long].collect().toSet | b2.select("doc_id").as[Long].collect().toSet))
    // the unshingleable doc passed through to out but was not indexed
    assert(outIds.contains(3000000L) && !dupIds.contains(3000000L))
    // index holds keys only for clean SIGNED docs
    val idxIds = spark.read.parquet(idx).select("doc_id").as[Long].collect().toSet
    assert(idxIds == outIds - 3000000L)
  }

  test("boilerplate band collisions below the Jaccard threshold are NOT quarantined") {
    val base = java.nio.file.Files.createTempDirectory("graft_ndverify").toString
    val (idx, out, dup) = (s"$base/idx", s"$base/out", s"$base/dup")
    // every doc shares an 8-token boilerplate header but is otherwise
    // unique: true Jaccard ~ 6/22 = 272 milli — well under 500. With
    // 1-row bands the shared header makes band collisions near-certain
    // (any of the 8 min-hashes landing in the shared shingles collides).
    val header = "terms of service apply to this document copyright"
    def doc(i: Long) = (i, s"$header u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h")
    val b1 = Seq(doc(1L)).toDF("doc_id", "text")
    // batch 2: boilerplate-only docs + one REAL near-dup of doc 1
    // (header + doc 1's filler minus the last token -> Jaccard ~ 12/14)
    val realDup = (100L, s"$header u1a u1b u1c u1d u1e u1f u1g")
    val b2 = ((2L to 20L).map(doc) :+ realDup).toDF("doc_id", "text")

    NearDupStream.applyBatch(b1, "doc_id", "text", 8, 3, 8, 1, idx, out, dup,
      minJaccardMilli = 500L)
    NearDupStream.applyBatch(b2, "doc_id", "text", 8, 3, 8, 1, idx, out, dup,
      minJaccardMilli = 500L)

    val outIds = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    val dupIds = spark.read.parquet(dup).select("doc_id").as[Long].collect().toSet
    // the real near-dup was caught; NO boilerplate-only doc was misfiled
    assert(dupIds == Set(100L), s"quarantined $dupIds")
    assert(outIds == (1L to 20L).toSet)
    // the rejected-candidate evidence is observable, and it is what
    // kept the boilerplate docs out of quarantine: band collisions
    // happened (candidates exist) but failed exact-Jaccard verification
    val rejected = spark.read.parquet(dup + "_rejected")
      .select("doc_a", "doc_b", "jaccard_milli")
      .as[(Long, Long, Option[Long])].collect().toSeq
    assert(rejected.nonEmpty, "boilerplate must band-collide somewhere")
    assert(!rejected.exists(r => r._1 == 1L && r._2 == 100L),
      "the real dup pair must verify, not reject")
    // rejection evidence carries the measured similarity that failed
    assert(rejected.forall(_._3.forall(_ < 500L)), s"rejected jaccards: $rejected")
    // quarantine evidence names the keeper and the verified strength
    val ev = spark.read.parquet(dup)
      .select("doc_id", "first_corpus_id", "best_jaccard_milli")
      .as[(Long, Long, Long)].head()
    assert(ev == ((100L, 1L, ev._3)) && ev._3 >= 500L)
  }

  test("a bucket flood past maxBucketSize is verified via star edges, not admitted") {
    val base = java.nio.file.Files.createTempDirectory("graft_ndflood").toString
    val (idx, out, dup) = (s"$base/idx", s"$base/out", s"$base/dup")
    // 20 identical docs in ONE micro-batch, cap 5: the pair expansion
    // drops the size-20 buckets; without the star-edge path the whole
    // flood would be admitted as clean and seed a degenerate bucket
    val flood = (1L to 20L)
      .map(i => (i, "identical boilerplate flood text repeated verbatim everywhere"))
      .toDF("doc_id", "text")
    NearDupStream.applyBatch(flood, "doc_id", "text", 8, 3, 4, 2, idx, out, dup,
      minJaccardMilli = 500L, maxBucketSize = 5)

    val outIds = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    val dupIds = spark.read.parquet(dup).select("doc_id").as[Long].collect().toSet
    assert(outIds == Set(1L), s"only the keeper survives, got $outIds")
    assert(dupIds == (2L to 20L).toSet)
    // evidence: everyone lost to the keeper at Jaccard 1000
    val ev = spark.read.parquet(dup)
      .select("first_corpus_id", "best_jaccard_milli")
      .as[(Long, Long)].collect()
    assert(ev.forall(_ == ((1L, 1000L))))
    // and the index holds only the keeper's band keys
    assert(spark.read.parquet(idx).select("doc_id").distinct()
      .as[Long].collect().toSet == Set(1L))
  }
}
