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
  // A DataFrame is an immutable logical plan, so reuse is free.
  //
  // CONTRACT: a cached path's file listing is captured at first read —
  // the fixture dirs this catalog serves are immutable for a session's
  // lifetime (the driver writes them once, before any query runs). A
  // caller that rewrites a parquet dir mid-session (compaction tests,
  // sink round-trips) must NOT read it through this catalog, or must
  // call `invalidate` after the rewrite; otherwise the stale listing
  // yields old rows or FileNotFoundException on deleted files. The
  // repo's sink/compaction specs read rewritten output via
  // `spark.read.parquet` directly, never through here.
  //
  // Sessions are weak keys: a stopped SparkSession's plans are
  // unreachable garbage, and a strong static map would pin every
  // session (and its whole plan tree) forever in a long-lived JVM.
  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = {
      val existing = cache.get(spark)
      if (existing != null) existing
      else cache.synchronized {
        val again = cache.get(spark)
        if (again != null) again
        else {
          val fresh = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
          cache.put(spark, fresh)
          fresh
        }
      }
    }
    perSession.computeIfAbsent(s"$dir/$name.parquet", p => spark.read.parquet(p))
  }

  /** Drop cached plans (all sessions, or one path in one session).
    * Call after rewriting a parquet dir that was previously read
    * through this catalog.
    */
  def invalidate(): Unit = cache.synchronized { cache.clear() }
  def invalidate(spark: SparkSession, dir: String, name: String): Unit = {
    val perSession = cache.get(spark)
    if (perSession != null) perSession.remove(s"$dir/$name.parquet")
  }
}
