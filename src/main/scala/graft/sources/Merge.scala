package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Upsert into a table hive-partitioned by `partitionCol`. Returns
    * the number of partitions rewritten.
    */
  def upsertPartitioned(spark: SparkSession, path: String, updates: DataFrame,
                        keyCols: Seq[String], partitionCol: String): Int = {
    val touched = updates.select(partitionCol).distinct().collect()
      .map(_.get(0))
    val target = spark.read.parquet(path)
      .where(col(partitionCol).isin(touched: _*))
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
    val touched = changes.select(partitionCol).distinct().collect()
      .map(_.get(0))
    if (touched.isEmpty) return 0
    val target = spark.read.parquet(path)
      .where(col(partitionCol).isin(touched: _*))
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
    // would silently keep its stale files — clear it explicitly
    val remaining = merged.select(partitionCol).distinct().collect()
      .map(r => String.valueOf(r.get(0))).toSet
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    touched.map(String.valueOf(_)).filterNot(remaining.contains).foreach { p =>
      fs.delete(new org.apache.hadoop.fs.Path(path, s"$partitionCol=$p"), true)
      ()
    }
    touched.length
  }
}
