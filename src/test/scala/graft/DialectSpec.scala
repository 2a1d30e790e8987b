package graft

import graft.sources.{DerbyDialect, Dialects, MssqlDialect, RedshiftDialect}
import graft.types.TypeMapper
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** JDBC dialect matrix without a server: golden statement strings per
  * dialect (the exact SQL the reference renders for its MSSQL source
  * and Redshift sink, with quoting the reference's f-strings lack),
  * quoting/escaping behavior, and the §1.2 type matrix round-tripped
  * through TypeMapper under each dialect.
  */
class DialectSpec extends AnyFunSuite {

  test("golden: MSSQL chunked-scan statement (reference rdbms_operations.py:224)") {
    assert(MssqlDialect.scanSql("dbo", "orders") == "SELECT * FROM dbo.orders")
    // non-plain identifiers take bracket quoting, ']' doubled
    assert(MssqlDialect.scanSql("dbo", "order table") ==
      "SELECT * FROM dbo.[order table]")
    assert(MssqlDialect.quote("a]b") == "[a]]b]")
  }

  test("golden: Redshift TRUNCATE + COPY + reconcile (redshift_operations.py:144-154)") {
    assert(RedshiftDialect.truncateSql("analytics", "fact_orders") ==
      "TRUNCATE TABLE analytics.fact_orders")
    assert(RedshiftDialect.copyStatement("analytics", "fact_orders",
      "s3://bucket/exports/fact_orders/", "arn:aws:iam::1:role/loader") ==
      "COPY analytics.fact_orders FROM 's3://bucket/exports/fact_orders/'" +
        " IAM_ROLE 'arn:aws:iam::1:role/loader' FORMAT AS PARQUET")
    assert(RedshiftDialect.copyStatement("analytics", "fact_orders",
      "s3://bucket/exports/manifest.json", "arn:aws:iam::1:role/loader",
      manifest = true).endsWith("FORMAT AS PARQUET MANIFEST"))
    assert(RedshiftDialect.lastCopyCountSql == "SELECT PG_LAST_COPY_COUNT()")
  }

  test("quoting neutralizes injection attempts in every dialect") {
    // a value that would break out of the reference's f-string
    val evil = "t'; DROP TABLE users; --"
    assert(MssqlDialect.quote(evil) == s"[$evil]")
    assert(RedshiftDialect.quote(evil) == "\"" + evil + "\"")
    // quote characters themselves are doubled, never terminate early
    assert(RedshiftDialect.quote("a\"b") == "\"a\"\"b\"")
    // COPY string values escape embedded quotes
    assert(RedshiftDialect.copyStatement("s", "t", "s3://x/o'brien", "r")
      .contains("'s3://x/o''brien'"))
    // NUL can defeat downstream C parsers — refused outright
    intercept[IllegalArgumentException](MssqlDialect.quote("a\u0000b"))
    intercept[IllegalArgumentException](RedshiftDialect.quote(""))
  }

  test("§1.2 type matrix resolves per dialect, including the timestamp divergence") {
    // MSSQL source-side names (reference rdbms_operations.py:69-78)
    val mssql = Seq(
      "bigint" -> LongType, "int" -> IntegerType,
      "smallint" -> ShortType, "tinyint" -> ShortType, "bit" -> ShortType,
      "decimal(12,4)" -> DecimalType(12, 4), "money" -> DecimalType(19, 4),
      "float" -> FloatType, "real" -> FloatType,
      "varchar(255)" -> StringType, "nvarchar(max)" -> StringType,
      "uniqueidentifier" -> StringType,
      "date" -> DateType, "datetime" -> TimestampType,
      "varbinary(max)" -> BinaryType,
      // MSSQL timestamp is a ROWVERSION: string, not a wall clock
      "timestamp" -> StringType)
    mssql.foreach { case (ddl, t) =>
      assert(TypeMapper.toSparkType(ddl, MssqlDialect) == t, s"mssql $ddl")
    }
    // Redshift sink-side names (reference redshift_operations.py:89-102)
    val redshift = Seq(
      "bigint" -> LongType, "integer" -> IntegerType, "smallint" -> ShortType,
      "numeric(18,2)" -> DecimalType(18, 2), "real" -> FloatType,
      "double precision" -> DoubleType,
      "character varying" -> StringType, "character" -> StringType,
      "date" -> DateType,
      "timestamp without time zone" -> TimestampType,
      // Redshift timestamp IS a wall clock — the divergence
      "timestamp" -> TimestampType)
    redshift.foreach { case (ddl, t) =>
      assert(TypeMapper.toSparkType(ddl, RedshiftDialect) == t, s"redshift $ddl")
    }
  }

  test("ddlFor round-trips through TypeMapper under every dialect") {
    val matrix = Seq(LongType, IntegerType, ShortType, DecimalType(12, 4),
      FloatType, DoubleType, StringType, DateType, TimestampType, BinaryType)
    Dialects.all.foreach { d =>
      matrix.foreach { t =>
        if (d == RedshiftDialect && t == BinaryType)
          intercept[IllegalArgumentException](d.ddlFor(t)) // no VARBYTE yet
        else {
          val ddl = d.ddlFor(t)
          assert(TypeMapper.toSparkType(ddl, d) == t,
            s"${d.name}: $t -> '$ddl' -> ${TypeMapper.toSparkType(ddl, d)}")
        }
      }
    }
  }

  test("dialect registry resolves by name and rejects unknowns") {
    assert(Dialects.byName("MSSQL") == MssqlDialect)
    assert(Dialects.byName("redshift") == RedshiftDialect)
    assert(Dialects.byName("derby") == DerbyDialect)
    intercept[IllegalArgumentException](Dialects.byName("oracle"))
  }
}
