package graft.streaming

import graft.ops.{Dedup, LshIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming near-duplicate filtering with VERIFIED quarantine: each
  * micro-batch of documents is MinHash-signed (narrow), probed against
  * the persisted [[LshIndex]] AND against itself (in-batch collisions,
  * lowest id kept), and every flagged candidate pair is confirmed by
  * exact shingle-set Jaccard ([[Dedup.verifyCandidatePairs]]) BEFORE
  * any destructive decision — LSH banding sets the recall, the
  * verification join sets the precision, so two documents that merely
  * share boilerplate in one band are not misfiled. Verified collisions
  * are quarantined to `dupPath` with their evidence (collision count,
  * keeper id, strongest Jaccard); candidates that FAIL verification
  * pass through as clean, with the rejected pair evidence appended to
  * `dupPath + "_rejected"` so candidate-precision misses stay
  * observable. Clean docs land in `outPath` and their band keys join
  * the index.
  *
  * The verification corpus for cross-batch pairs is `outPath` itself:
  * the stream's accepted output IS the clean corpus, so the text of
  * any colliding corpus doc is on hand without a second store. The
  * per-pair cost is one in-row array_intersect over the (tiny) flagged
  * pair set — the corpus is never re-shingled wholesale.
  *
  * Bucket floods: [[Dedup.lshCandidatePairs]] drops buckets over
  * `maxBucketSize` (the C(n,2) guard). Dropping them from a QUARANTINE
  * decision would admit a >cap boilerplate flood arriving in one
  * micro-batch as clean and seed the index with a degenerate bucket —
  * so oversized buckets contribute STAR edges (keeper -> member, n-1,
  * linear) via [[Dedup.lshOversizedBucketEdges]], keeping every member
  * verified against the bucket keeper.
  *
  * The cross-batch memory lives in the table tier (same stance as
  * [[SegmentDedupStream]]): index size tracks the CLEAN corpus, and
  * per-batch cost tracks the batch.
  */
object NearDupStream {

  def start(docs: DataFrame, idCol: String, textCol: String,
            k: Int, shingleWidth: Int, bands: Int, rowsPerBand: Int,
            indexPath: String, outPath: String, dupPath: String,
            checkpointDir: String,
            minJaccardMilli: Long = 500L,
            maxBucketSize: Int = 1000): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          applyBatch(batch, idCol, textCol, k, shingleWidth, bands,
            rowsPerBand, indexPath, outPath, dupPath,
            minJaccardMilli, maxBucketSize)
      }
      .start()

  private def tableExists(spark: org.apache.spark.sql.SparkSession,
                          path: String): Boolean =
    try { spark.read.parquet(path).schema; true }
    catch { case _: org.apache.spark.sql.AnalysisException => false }

  /** One micro-batch of the loop; also the unit the spec replays. */
  def applyBatch(batch: DataFrame, idCol: String, textCol: String,
                 k: Int, shingleWidth: Int, bands: Int, rowsPerBand: Int,
                 indexPath: String, outPath: String, dupPath: String,
                 minJaccardMilli: Long = 500L,
                 maxBucketSize: Int = 1000): Unit = {
    val spark = batch.sparkSession
    val sig = Dedup.minhashSignaturesFast(batch, idCol, textCol,
      k, shingleWidth)

    // candidate pairs, (doc_a = incumbent/keeper, doc_b = candidate):
    //  - cross-batch: index probe, corpus doc is the incumbent
    //  - in-batch: bucket-local pair expansion, ordered a < b, so
    //    dropping every verified doc_b keeps exactly the lowest id of
    //    each collision chain
    //  - flood: star edges of buckets past maxBucketSize (the pair
    //    expansion drops those buckets; the quarantine decision must not)
    val crossBatch =
      if (tableExists(spark, indexPath))
        LshIndex.probe(spark, indexPath, sig, idCol, bands, rowsPerBand)
          .select(col("corpus_id").as("doc_a"), col("batch_id").as("doc_b"))
      else
        sig.select(col(idCol).as("doc_a"), col(idCol).as("doc_b")).where(lit(false))
    val inBatch = Dedup.lshCandidatePairs(sig, idCol, bands, rowsPerBand,
      maxBucketSize)
    val flood = Dedup.lshOversizedBucketEdges(sig, idCol, bands, rowsPerBand,
      maxBucketSize)
    val candidates = crossBatch.unionByName(inBatch).unionByName(flood)
      .distinct()
      .localCheckpoint(true) // consumed 3x below (ids, scoring, rejected)

    // verification corpus = this batch + everything previously
    // accepted, semi-joined down to the docs that actually appear in a
    // candidate pair BEFORE any tokenize/shingle work happens. The
    // candidate id set is tiny (it tracks the flagged pairs, not the
    // corpus) and broadcasts, so each batch re-shingles only the
    // handful of corpus docs it collided with — per-batch cost tracks
    // the batch, never the accepted-corpus lifetime.
    val candidateIds = candidates.select(col("doc_a").as(idCol))
      .unionByName(candidates.select(col("doc_b").as(idCol)))
      .distinct()
    val corpusAll =
      if (tableExists(spark, outPath))
        batch.select(col(idCol), col(textCol))
          .unionByName(spark.read.parquet(outPath).select(col(idCol), col(textCol)))
      else batch.select(col(idCol), col(textCol))
    val corpusText = corpusAll.join(broadcast(candidateIds), Seq(idCol), "left_semi")

    // snapshot every decision BEFORE any write mutates its sources
    // (candidates reads indexPath, corpusText reads outPath). Scoring
    // runs ONCE at threshold 0 so the rejected pairs keep their actual
    // Jaccard as evidence; the quarantine threshold splits afterwards.
    val scored = Dedup.verifyCandidatePairs(corpusText, idCol, textCol,
      candidates, shingleWidth, minJaccardMilli = 0L)
      .localCheckpoint(true)
    val flagged = scored
      .where(col("jaccard_milli") >= minJaccardMilli)
      .groupBy(col("doc_b").as(idCol))
      .agg(count(lit(1)).as("n_collisions"),
        min("doc_a").as("first_corpus_id"),
        max("jaccard_milli").as("best_jaccard_milli"))
      .localCheckpoint(true)
    // candidate pairs that did NOT verify: the docs pass through as
    // clean, the pair evidence stays observable beside the quarantine.
    // Pairs whose corpus side could not be scored (unshingleable) keep
    // null scores rather than vanishing.
    val rejected = scored
      .where(col("jaccard_milli") < minJaccardMilli)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard_milli"))
      .unionByName(candidates
        .join(scored.select("doc_a", "doc_b"), Seq("doc_a", "doc_b"), "left_anti")
        .withColumn("n_common", lit(null).cast("long"))
        .withColumn("jaccard_milli", lit(null).cast("long")))
      .localCheckpoint(true)
    val cleanSig = sig.join(flagged.select(idCol), Seq(idCol), "left_anti")
      .localCheckpoint(true)

    batch.join(flagged, Seq(idCol), "inner")
      .write.mode("append").parquet(dupPath)
    rejected.write.mode("append").parquet(dupPath + "_rejected")
    // clean = batch minus flagged — NOT batch ∩ signed: documents too
    // short to shingle have no signature, cannot be near-dup-checked,
    // and must pass through rather than vanish from both outputs
    batch.join(flagged.select(idCol), Seq(idCol), "left_anti")
      .write.mode("append").parquet(outPath)
    LshIndex.append(cleanSig, idCol, bands, rowsPerBand, indexPath)
  }
}
