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

  // Scan-plan cache: building a parquet scan costs a file listing and
  // a footer schema read EVERY call — pure fixed overhead when 100+
  // bench/verify queries each re-derive the same handful of tables.
  // A DataFrame is an immutable logical plan, so reuse is free; keyed
  // by session so a restarted session never sees a stale plan.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      key => spark.read.parquet(key._2))
}
