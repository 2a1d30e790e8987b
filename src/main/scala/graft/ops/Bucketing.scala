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
                    numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet") // managed table under spark.sql.warehouse.dir
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
