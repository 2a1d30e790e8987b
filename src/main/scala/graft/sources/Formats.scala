package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format round-trips beyond Parquet: CSV, JSON-lines, ORC.
  *
  * The reference's only at-rest format is Parquet (SURVEY.md §2.2
  * "Sinks / formats"); a complete engine needs the interchange
  * formats too. All are Spark-native sources — schema is supplied
  * explicitly (never re-inferred on read: inference is a full extra
  * scan at 100 TB, and type drift between runs breaks pipelines).
  */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
