package graft.streaming

import graft.ops.{Dedup, LshIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming near-duplicate filtering: each micro-batch of documents
  * is MinHash-signed (narrow), probed against the persisted
  * [[LshIndex]] AND against itself (in-batch collisions, lowest id
  * kept), and split — colliding docs are quarantined to `dupPath`
  * with their collision evidence, clean docs land in `outPath` and
  * their band keys join the index. The
  * cross-batch memory lives in the table tier (same stance as
  * [[SegmentDedupStream]]): index size tracks the CLEAN corpus, and
  * per-batch cost tracks the batch.
  *
  * This is candidate-level filtering (LSH collisions, precision set
  * by the band config); a verification join (exact Jaccard over the
  * flagged pairs only) slots between probe and quarantine when
  * candidate precision isn't enough.
  */
object NearDupStream {

  def start(docs: DataFrame, idCol: String, textCol: String,
            k: Int, shingleWidth: Int, bands: Int, rowsPerBand: Int,
            indexPath: String, outPath: String, dupPath: String,
            checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          applyBatch(batch, idCol, textCol, k, shingleWidth, bands,
            rowsPerBand, indexPath, outPath, dupPath)
      }
      .start()

  /** One micro-batch of the loop; also the unit the spec replays. */
  def applyBatch(batch: DataFrame, idCol: String, textCol: String,
                 k: Int, shingleWidth: Int, bands: Int, rowsPerBand: Int,
                 indexPath: String, outPath: String, dupPath: String): Unit = {
    val spark = batch.sparkSession
    val sig = Dedup.minhashSignaturesFast(batch, idCol, textCol,
      k, shingleWidth)

    val indexExists =
      try { spark.read.parquet(indexPath).schema; true }
      catch { case _: org.apache.spark.sql.AnalysisException => false }

    // collision evidence per flagged doc, from two sources: the
    // persisted index (cross-batch) and the batch against itself
    // (in-batch, conservative first-keeper: any doc colliding with a
    // lower-id batch doc is quarantined — pairs come ordered
    // doc_a < doc_b, so dropping every doc_b keeps exactly the
    // lowest id of each collision chain's head). Evidence = collision
    // count + smallest colliding id. Snapshot before the index append
    // below mutates the source.
    val crossBatch =
      if (indexExists)
        LshIndex.probe(spark, indexPath, sig, idCol, bands, rowsPerBand)
          .select(col("batch_id").as(idCol), col("corpus_id"))
      else
        sig.select(col(idCol), col(idCol).as("corpus_id")).where(lit(false))
    val inBatch = Dedup
      .lshCandidatePairs(sig, idCol, bands, rowsPerBand)
      .select(col("doc_b").as(idCol), col("doc_a").as("corpus_id"))
    val flagged = crossBatch.unionByName(inBatch)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_collisions"),
        min("corpus_id").as("first_corpus_id"))
      .localCheckpoint(true)

    val cleanSig = sig.join(flagged.select(idCol), Seq(idCol), "left_anti")
      .localCheckpoint(true)

    batch.join(flagged, Seq(idCol), "inner")
      .write.mode("append").parquet(dupPath)
    // clean = batch minus flagged — NOT batch ∩ signed: documents too
    // short to shingle have no signature, cannot be near-dup-checked,
    // and must pass through rather than vanish from both outputs
    batch.join(flagged.select(idCol), Seq(idCol), "left_anti")
      .write.mode("append").parquet(outPath)
    LshIndex.append(cleanSig, idCol, bands, rowsPerBand, indexPath)
  }
}
