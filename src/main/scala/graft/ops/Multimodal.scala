package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, processed via typed-Dataset
  * mapPartitions (the Scala analogue of mapInPandas batch UDFs).
  *
  * The Spark-side plumbing — schema, encoders, partition-batched
  * execution, feature schema — is real and tested. The codec step is a
  * STUB: this container ships no image/audio libraries, so
  * `decodeStub` derives deterministic pseudo-features (md5 fingerprint
  * + length-based dimensions) instead of calling a real decoder. A
  * production build swaps `decodeStub` for a JNI/codec call without
  * touching any of the distributed plumbing.
  *
  * Scale notes: mapPartitions keeps per-record overhead amortized over
  * a whole partition (one codec context per partition, not per row);
  * binary payloads never pass through a shuffle here — features are
  * extracted before any aggregation, so only the (tiny) feature rows
  * move.
  */
object Multimodal {

  /** An opaque media payload + metadata. */
  case class MediaRecord(id: Long, kind: String, data: Array[Byte])

  /** Extracted features (decode output). */
  case class MediaFeatures(id: Long, kind: String, size_bytes: Long,
                           width: Int, height: Int, n_frames: Int,
                           fingerprint: String)

  /** STUB decoder — deterministic pseudo-decode; see class docs.
    * Real implementation: ??? (image/audio codec unavailable here).
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val fp = md.digest(r.data).map("%02x".format(_)).mkString
    val n = r.data.length
    MediaFeatures(r.id, r.kind, n.toLong, n % 640, (n * 7) % 480, n / 100, fp)
  }

  /** Partition-batched feature extraction over typed records. One
    * decoder instance per partition (the mapPartitions body is where a
    * real codec context would be opened once).
    */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it => it.map(decodeStub) }
  }

  /** Lift a (id, binary) frame into the typed pipeline. */
  def fromBinaryFrame(spark: SparkSession, df: DataFrame, idCol: String,
                      dataCol: String, kind: String): Dataset[MediaRecord] = {
    import spark.implicits._
    df.selectExpr(s"CAST($idCol AS BIGINT) AS id", s"'$kind' AS kind",
        s"CAST($dataCol AS BINARY) AS data")
      .as[MediaRecord]
  }
}
