package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC scan (reference O-1) and bulk-load sink (reference O-11) as
  * option-driven wrappers over Spark's JDBC source.
  *
  * The reference streams `SELECT * FROM schema.table` in 1M-row
  * chunks on one thread (utils/rdbms_operations.py:197-248). On Spark
  * the chunking becomes partition parallelism: `partitionColumn` +
  * `numPartitions` split the scan into concurrent range queries, and
  * `fetchsize` bounds per-round-trip memory — config, not code.
  * Schema comes from JDBC metadata at plan time (the engine's
  * replacement for the reference's DDL-introspection string-eval,
  * O-2/O-3).
  */
object JdbcSource {

  final case class ScanConfig(
      url: String,
      schema: String,
      table: String,
      user: String,
      password: String,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Int = 8,
      fetchSize: Int = 100000)

  object ScanConfig {
    /** Build a scan config with credentials resolved through a
      * [[SecretProvider]] chain (reference config_gen.py:60-123's
      * env-then-config fallback, without values in code): keys are
      * `<name>.url`, `<name>.user`, `<name>.password`.
      */
    def fromSecrets(secrets: SecretProvider, name: String,
                    schema: String, table: String,
                    partitionColumn: Option[String] = None,
                    lowerBound: Option[Long] = None,
                    upperBound: Option[Long] = None,
                    numPartitions: Int = 8): ScanConfig =
      ScanConfig(
        url = secrets.require(s"$name.url"),
        schema = schema, table = table,
        user = secrets.require(s"$name.user"),
        password = secrets.require(s"$name.password"),
        partitionColumn = partitionColumn,
        lowerBound = lowerBound, upperBound = upperBound,
        numPartitions = numPartitions)
  }

  /** Pure option-map construction (unit-testable without a DB). */
  def options(c: ScanConfig): Map[String, String] = {
    val base = Map(
      "url" -> c.url,
      "dbtable" -> s"${c.schema}.${c.table}",
      "user" -> c.user,
      "password" -> c.password,
      "fetchsize" -> c.fetchSize.toString)
    c.partitionColumn match {
      case Some(pc) =>
        base ++ Map(
          "partitionColumn" -> pc,
          "lowerBound" -> c.lowerBound.getOrElse(0L).toString,
          "upperBound" -> c.upperBound.getOrElse(Long.MaxValue).toString,
          "numPartitions" -> c.numPartitions.toString)
      case None => base
    }
  }

  def read(spark: SparkSession, c: ScanConfig): DataFrame =
    spark.read.format("jdbc").options(options(c)).load()

  /** Bulk-load sink ≈ the reference's TRUNCATE + COPY
    * (utils/redshift_operations.py:121-167): overwrite with
    * truncate=true preserves the target's DDL while replacing rows —
    * idempotent across re-runs (SURVEY.md §7.3).
    */
  def overwrite(df: DataFrame, url: String, schema: String, table: String,
                user: String, password: String): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", s"$schema.$table")
      .option("user", user)
      .option("password", password)
      .option("truncate", "true")
      .mode("overwrite")
      .save()
}
