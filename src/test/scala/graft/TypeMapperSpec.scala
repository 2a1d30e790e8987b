package graft

import graft.types.TypeMapper
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Every row of the SURVEY.md §1.2 type matrix. */
class TypeMapperSpec extends AnyFunSuite {

  test("reference DDL type matrix maps exactly") {
    val expected = Seq(
      "bigint" -> LongType,
      "int" -> IntegerType, "integer" -> IntegerType,
      "smallint" -> ShortType, "tinyint" -> ShortType,
      "bit" -> ShortType, "boolean" -> ShortType,
      "decimal(12,4)" -> DecimalType(12, 4),
      "numeric(10,2)" -> DecimalType(10, 2),
      "money" -> DecimalType(19, 4),
      "float" -> FloatType, "real" -> FloatType,
      "double precision" -> DoubleType,
      "text" -> StringType, "char" -> StringType, "nchar" -> StringType,
      "varchar" -> StringType, "nvarchar" -> StringType,
      "varchar(255)" -> StringType, "character varying" -> StringType,
      "character" -> StringType, "uniqueidentifier" -> StringType,
      "timestamp" -> StringType, // MSSQL rowversion -> string
      "date" -> DateType,
      "datetime" -> TimestampType, "smalldatetime" -> TimestampType,
      "time" -> TimestampType,
      "timestamp without time zone" -> TimestampType,
      "varbinary" -> BinaryType, "varbinary(max)" -> BinaryType)
    expected.foreach { case (ddl, t) =>
      assert(TypeMapper.toSparkType(ddl) == t, s"for DDL '$ddl'")
    }
  }

  test("case and whitespace insensitive") {
    assert(TypeMapper.toSparkType(" BIGINT ") == LongType)
    assert(TypeMapper.toSparkType("Decimal(5, 2)") == DecimalType(5, 2))
  }

  test("unknown type fails fast") {
    assertThrows[IllegalArgumentException](TypeMapper.toSparkType("geometry"))
  }

  test("structFor builds schema with nullability") {
    val st = TypeMapper.structFor(Seq(
      ("id", "bigint", false), ("name", "varchar(10)", true)))
    assert(st == StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true))))
  }
}
