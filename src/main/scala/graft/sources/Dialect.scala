package graft.sources

import org.apache.spark.sql.types._

/** Warehouse dialect facts for the JDBC source/sink family (O-1/O-11):
  * identifier quoting, scan SQL, bulk-load statement shapes, and the
  * DDL names each dialect reports for the §1.2 type matrix. The
  * reference hardcodes its two ends — MSSQL as the chunked source
  * (`utils/rdbms_operations.py:224` renders `SELECT * FROM
  * {schema}.{table}` into pandas `read_sql`) and Redshift as the COPY
  * sink (`utils/redshift_operations.py:144-149` renders TRUNCATE +
  * `COPY … FORMAT AS PARQUET` + `PG_LAST_COPY_COUNT()` f-strings).
  * Here both ends are data: each dialect renders the same statements
  * with ITS quoting, and every identifier is either validated-plain
  * or dialect-escaped — nothing caller-supplied splices raw (the
  * injection gap the reference's f-strings leave open).
  *
  * This is render-layer only by design: the sandbox has no MSSQL/
  * Redshift server, so the live e2e runs against embedded Derby
  * ([[JdbcSource.bulkLoadCsvNative]], JdbcE2eSpec) and the dialect
  * matrix is pinned by golden statement strings + the §1.2 type
  * round-trip per dialect (DialectSpec).
  */
sealed trait JdbcDialect {
  def name: String

  /** `timestamp` means wall-clock (Redshift/PG) vs rowversion-string
    * (MSSQL) — the one §1.2 name whose meaning diverges by dialect.
    */
  def timestampIsWallClock: Boolean

  /** Dialect-quoted identifier. Plain identifiers pass through
    * unquoted (matching the reference's rendering for its own
    * tables); anything else is escaped with the dialect's quote
    * convention, with embedded closers doubled.
    */
  def quote(ident: String): String = {
    require(ident.nonEmpty && !ident.contains("\u0000"),
      "identifier empty or contains NUL")
    if (Dialects.PlainIdent.matches(ident)) ident else quoteAlways(ident)
  }

  protected def quoteAlways(ident: String): String

  def qualified(schema: String, table: String): String =
    s"${quote(schema)}.${quote(table)}"

  /** The chunked-scan statement (reference rdbms_operations.py:224).
    * On Spark the 1M-row chunking becomes partition parallelism
    * ([[JdbcSource.options]]); the statement itself is what a debug
    * trace or a `query`-option scan sees.
    */
  def scanSql(schema: String, table: String): String =
    s"SELECT * FROM ${qualified(schema, table)}"

  def truncateSql(schema: String, table: String): String =
    s"TRUNCATE TABLE ${qualified(schema, table)}"

  def countSql(schema: String, table: String): String =
    s"SELECT COUNT(*) FROM ${qualified(schema, table)}"

  /** DDL type name for a Spark type — the reverse of
    * [[graft.types.TypeMapper.toSparkType]], restricted to the §1.2
    * matrix. Every rendered name must resolve back to the same Spark
    * type under THIS dialect (round-trip pinned by DialectSpec).
    */
  def ddlFor(dt: DataType): String = dt match {
    case LongType           => "bigint"
    case IntegerType        => "int"
    case ShortType          => "smallint"
    case d: DecimalType     => s"decimal(${d.precision},${d.scale})"
    case FloatType          => "real"
    case DoubleType         => "double precision"
    case StringType         => "varchar(max)"
    case DateType           => "date"
    case TimestampType      => "datetime"
    case BinaryType         => "varbinary(max)"
    case other => throw new IllegalArgumentException(
      s"$name has no §1.2 DDL rendering for $other")
  }
}

/** MSSQL — the reference's chunked SOURCE. Bracket quoting, `]`
  * doubled; `timestamp` is a rowversion (string).
  */
case object MssqlDialect extends JdbcDialect {
  val name = "mssql"
  val timestampIsWallClock = false
  protected def quoteAlways(ident: String): String =
    "[" + ident.replace("]", "]]") + "]"
}

/** Redshift — the reference's COPY SINK. Double-quote quoting per the
  * Postgres lineage; `timestamp` is wall-clock; carries the COPY
  * statement family ([[copyStatement]], [[lastCopyCountSql]]).
  */
case object RedshiftDialect extends JdbcDialect {
  val name = "redshift"
  val timestampIsWallClock = true
  protected def quoteAlways(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""
  override def ddlFor(dt: DataType): String = dt match {
    case StringType    => "character varying" // Redshift's reported name
    case TimestampType => "timestamp without time zone"
    case FloatType     => "real"
    case BinaryType    => throw new IllegalArgumentException(
      "redshift has no varbinary column type (VARBYTE postdates the reference)")
    case other         => super.ddlFor(other)
  }

  private def sqlString(v: String): String = "'" + v.replace("'", "''") + "'"

  /** `COPY … FROM 's3://…' IAM_ROLE '…' FORMAT AS PARQUET [MANIFEST]`
    * — the reference's sink statement (redshift_operations.py:144-149)
    * with identifiers dialect-quoted and values SQL-escaped.
    */
  def copyStatement(schema: String, table: String, location: String,
                    iamRole: String, manifest: Boolean = false): String = {
    val m = if (manifest) " MANIFEST" else ""
    s"COPY ${qualified(schema, table)} FROM ${sqlString(location)}" +
      s" IAM_ROLE ${sqlString(iamRole)} FORMAT AS PARQUET$m"
  }

  /** The post-COPY reconcile count (redshift_operations.py:154). */
  val lastCopyCountSql: String = "SELECT PG_LAST_COPY_COUNT()"
}

/** Embedded Derby — the dialect the live e2e actually runs against
  * (JdbcE2eSpec). Standard double-quote quoting; types per the SQL
  * standard subset Derby ships.
  */
case object DerbyDialect extends JdbcDialect {
  val name = "derby"
  val timestampIsWallClock = true
  protected def quoteAlways(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""
  override def ddlFor(dt: DataType): String = dt match {
    case StringType    => "varchar(32672)" // Derby's max varchar
    // Derby accepts only plain TIMESTAMP as DDL (no WITH/WITHOUT TIME
    // ZONE variants); TypeMapper already resolves it to TimestampType
    // via timestampIsWallClock, so the zoneless semantics are kept on
    // the read side.
    case TimestampType => "timestamp"
    case BinaryType    => "varbinary(32672)"
    case other         => super.ddlFor(other)
  }
}

object Dialects {
  private[sources] val PlainIdent = "[A-Za-z_][A-Za-z0-9_]*".r

  val all: Seq[JdbcDialect] = Seq(MssqlDialect, RedshiftDialect, DerbyDialect)

  def byName(n: String): JdbcDialect =
    all.find(_.name == n.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"unknown JDBC dialect '$n'"))
}
