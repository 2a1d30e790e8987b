package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: pre-shuffled storage for co-located joins.
  *
  * At 100 TB the dominant join cost is the exchange of the fact
  * table. Writing both join sides bucketed (and sorted) by the join
  * key lets sort-merge joins run with NO exchange and NO sort — each
  * bucket pair joins locally. The write pays the shuffle once;
  * every subsequent join of the bucketed tables is exchange-free
  * (verified in BucketingSpec by asserting the physical plan contains
  * no shuffle).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // the in-memory catalog forgets tables between sessions while the
    // warehouse directory survives — clear an orphaned location so
    // saveAsTable doesn't refuse it
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet") // managed table under spark.sql.warehouse.dir
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Bucketed AND multi-column-sorted write — the layout that makes
    * ORDER-sensitive co-located operators (sort-merge join, the
    * native as-of join) run with no Exchange: bucket by the join key,
    * sort by (key, secondary...) so each bucket pair merges locally.
    * With one file per bucket the scan also reports its sort order
    * and the in-partition Sort disappears too.
    */
  def writeBucketedSorted(df: DataFrame, table: String, bucketCol: String,
                          sortCols: Seq[String], numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
