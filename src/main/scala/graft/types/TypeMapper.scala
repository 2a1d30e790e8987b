package graft.types

import org.apache.spark.sql.types._

/** DDL type-name -> Spark `DataType`.
  *
  * Union of the reference's two DDL->Arrow mappings: the MSSQL source
  * path (reference utils/rdbms_operations.py:69-78) and the Redshift
  * target path (reference utils/redshift_operations.py:89-102), per
  * SURVEY.md §1.2. Unlike the reference — which string-codegens a
  * PyArrow schema and `eval`s it — this is a total function over type
  * names; schema construction is plain data, never code generation.
  */
object TypeMapper {

  private val ParamType = """^\s*([a-z_ ]+?)\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)\s*$""".r

  /** Map a DDL type name (e.g. "bigint", "decimal(12,4)", "varchar(255)")
    * to the Spark type the engine stores it as. Throws on unknown names
    * (fail-fast instead of the reference's silent `eval` failure mode).
    */
  def toSparkType(ddl: String): DataType = ddl.trim.toLowerCase match {
    case ParamType(base, p, s) =>
      base.trim match {
        case "decimal" | "numeric" =>
          DecimalType(p.toInt, Option(s).map(_.toInt).getOrElse(0))
        case "varchar" | "nvarchar" | "char" | "nchar" | "character varying" |
            "character" => StringType
        case "varbinary" | "binary" => BinaryType
        case other => toSparkType(other)
      }
    // non-numeric length args, e.g. varchar(max) / varbinary(max):
    // the length never affects the Spark type — strip and re-resolve
    case s if s.contains("(") => toSparkType(s.substring(0, s.indexOf('(')))
    case "bigint"                       => LongType
    case "int" | "integer"              => IntegerType
    // The reference widens booleans and sub-16-bit ints to int16
    // (rdbms_operations.py:71); that widening is the declared type
    // contract, so we preserve it.
    case "smallint" | "tinyint" | "bit" | "boolean" => ShortType
    case "decimal" | "numeric"          => DecimalType(38, 18)
    case "money"                        => DecimalType(19, 4)
    case "float" | "real"               => FloatType
    case "double precision" | "double"  => DoubleType
    case "text" | "char" | "nchar" | "varchar" | "nvarchar" |
        "uniqueidentifier" | "character varying" | "character" |
        "string" => StringType
    // MSSQL `timestamp` is a rowversion, stored as string by the
    // reference (rdbms_operations.py:75).
    case "timestamp"                    => StringType
    case "date"                         => DateType
    case "datetime" | "smalldatetime" | "time" |
        "timestamp without time zone"   => TimestampType
    case "varbinary" | "binary"         => BinaryType
    case other =>
      throw new IllegalArgumentException(s"Unknown DDL type: '$other'")
  }

  /** Dialect-aware resolution for the names whose meaning DIVERGES
    * between the reference's two warehouses: MSSQL `timestamp` is a
    * rowversion (stored as string, rdbms_operations.py:75), while
    * Redshift/Postgres `timestamp` is a wall-clock timestamp
    * (redshift_operations.py's information_schema path reports it as
    * `timestamp without time zone`). The 1-arg [[toSparkType]] keeps
    * the MSSQL reading (the reference's source side); this overload
    * resolves per dialect so a Redshift DDL round-trips correctly.
    */
  def toSparkType(ddl: String, dialect: graft.sources.JdbcDialect): DataType =
    ddl.trim.toLowerCase match {
      case "timestamp" if dialect.timestampIsWallClock => TimestampType
      case _ => toSparkType(ddl)
    }

  /** Build a StructType from (name, ddlType, nullable) metadata rows —
    * the engine's replacement for the reference's string-codegen'd
    * PyArrow schemas (rdbms_operations.py:117-118,
    * redshift_operations.py:104-115).
    */
  def structFor(cols: Seq[(String, String, Boolean)]): StructType =
    StructType(cols.map { case (n, t, nullable) =>
      StructField(n, toSparkType(t), nullable)
    })
}
