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
}
