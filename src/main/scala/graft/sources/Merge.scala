package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._

/** Keyed MERGE (upsert) into plain parquet — incremental loads for
  * the HistoryLoad layout without a table format: rows in `updates`
  * replace target rows with the same key, everything else survives.
  *
  * The scale shape is partition-scoped rewrite: compute the (small)
  * set of hive partitions the updates touch, read ONLY those
  * partitions, anti-join out the replaced keys, and write back with
  * dynamic partition overwrite — untouched partitions are never read
  * and never rewritten. At 100 TB an incremental load touches a few
  * date partitions; the rewrite cost is O(touched partitions), not
  * O(table).
  *
  * `localCheckpoint` cuts the lineage between the read and the
  * overwrite of the same path (Spark rejects a write whose plan still
  * reads the target files).
  */
object Merge {

  /** Touched-partition predicate. `isin` alone never matches NULL, so
    * a batch carrying a null partition key would skip reading the
    * `__HIVE_DEFAULT_PARTITION__` rows while the dynamic overwrite
    * still replaces that partition — silently dropping prior rows. An
    * explicit isNull branch keeps null-keyed batches merge-correct.
    */
  private[graft] def touchedPredicate(partitionCol: String,
                                      touched: Seq[Any]): Column = {
    val nonNull = touched.filter(_ != null)
    val base =
      if (nonNull.isEmpty) lit(false)
      else col(partitionCol).isin(nonNull: _*)
    if (nonNull.length != touched.length) base || col(partitionCol).isNull
    else base
  }

  /** Hive directory name for one partition value, rendered the way the
    * writer renders it: the value cast to string by the engine (NOT
    * `String.valueOf` — `java.sql.Timestamp.toString` carries a
    * trailing `.0` the writer never emits), Hive-escaped
    * (space/colon/percent/slash…), null → `__HIVE_DEFAULT_PARTITION__`.
    */
  private[graft] def partitionDirName(partitionCol: String,
                                      rendered: String): String = {
    val v =
      if (rendered == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
      else ExternalCatalogUtils.escapePathName(rendered)
    s"$partitionCol=$v"
  }

  /** Upsert into a table hive-partitioned by `partitionCol`. Returns
    * the number of partitions rewritten.
    */
  def upsertPartitioned(spark: SparkSession, path: String, updates: DataFrame,
                        keyCols: Seq[String], partitionCol: String): Int = {
    val touched = updates.select(partitionCol).distinct().collect()
      .map(_.get(0)).toIndexedSeq
    val target = spark.read.parquet(path)
      .where(touchedPredicate(partitionCol, touched))
    val survivors = target.join(
      updates.select(keyCols.map(col): _*), keyCols, "left_anti")
    val merged = survivors.unionByName(updates
        .select(target.columns.map(col).toIndexedSeq: _*))
      .localCheckpoint()

    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
    touched.length
  }

  /** Full CDC apply — the consumer of
    * [[graft.ops.ChangeCapture.snapshotDiff]]'s output, closing the
    * diff → apply loop: `changes` carries the key columns, a
    * `change_type` in insert | update | delete, and (for
    * insert/update) the full payload. Deletes anti-join out; inserts
    * and updates land like [[upsertPartitioned]]. Same partition-
    * scoped rewrite: only partitions named by the changes are read or
    * rewritten. Returns the partitions-rewritten count.
    *
    * Deleted keys must name their partition (the diff provides it —
    * a delete without a partition would force a table-wide scan, the
    * exact cost this op exists to avoid).
    */
  def applyChanges(spark: SparkSession, path: String, changes: DataFrame,
                   keyCols: Seq[String], partitionCol: String): Int = {
    // an unrecognized change_type would silently behave as a DELETE
    // (removed by the anti-join, never re-inserted) — fail instead
    val unknown = changes
      .where(!col("change_type").isin("insert", "update", "delete"))
      .limit(1).collect()
    require(unknown.isEmpty,
      s"applyChanges: unrecognized change_type in ${unknown.mkString}")
    // partition values are collected RENDERED (engine cast-to-string,
    // null kept as null) so the emptied-partition cleanup below can
    // name directories exactly the way the writer spelled them
    val touched = changes
      .select(col(partitionCol), col(partitionCol).cast("string").as("__r"))
      .distinct().collect()
      .map(r => (r.get(0), r.getString(1))).toIndexedSeq
    if (touched.isEmpty) return 0
    val target = spark.read.parquet(path)
      .where(touchedPredicate(partitionCol, touched.map(_._1)))
    // every changed key's old row goes — deletes stay gone, the rest
    // come back from the change payload
    val survivors = target.join(
      changes.select(keyCols.map(col): _*), keyCols, "left_anti")
    val upserts = changes
      .where(col("change_type").isin("insert", "update"))
      .select(target.columns.map(col).toIndexedSeq: _*)
    val merged = survivors.unionByName(upserts).localCheckpoint()
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
    // dynamic overwrite only replaces partitions the WRITE emits: a
    // partition whose last rows were all deleted writes nothing and
    // would silently keep its stale files — clear it explicitly, by
    // the Hive-ESCAPED directory name (a raw "$col=$value" misses any
    // value Hive escapes — space, ':', '/', '%' — leaving exactly the
    // stale files this cleanup exists to remove)
    val remaining = merged.select(col(partitionCol).cast("string"))
      .distinct().collect().map(r => Option(r.getString(0))).toSet
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    touched.map(_._2).filterNot(r => remaining.contains(Option(r)))
      .foreach { r =>
        fs.delete(new org.apache.hadoop.fs.Path(path,
          partitionDirName(partitionCol, r)), true)
        ()
      }
    touched.length
  }
}
