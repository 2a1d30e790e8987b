package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over the driver fixture directory: name -> DataFrame.
  *
  * Mirrors the reference's config-driven `{tablename: {...}}` catalog
  * (reference main.py:42) as a map from table name to a lazily-planned
  * parquet scan. Scans are declarative so Catalyst pushes filters and
  * prunes columns down to the parquet reader.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
