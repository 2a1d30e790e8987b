package graft

import graft.ops.{Audit, CompatCasts, SchemaOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class NormalizeSpec extends AnyFunSuite {
  import SchemaOps.normalizeName

  test("reference normalization rules (rdbms_operations.py:240-243)") {
    assert(normalizeName("Content Length - KB") == "content_length_kb")
    assert(normalizeName("A-B") == "ab")
    assert(normalizeName("x__y") == "x_y")
    assert(normalizeName("Already_ok") == "already_ok")
    assert(normalizeName("Retail  Price") == "retail_price")
  }

  test("idempotent") {
    Seq("Content Length - KB", "A-B", "x__y").foreach { n =>
      assert(normalizeName(normalizeName(n)) == normalizeName(n))
    }
  }
}

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeNames fails fast on collision") {
    val df = Seq((1, 2)).toDF("a-b", "ab")
    assertThrows[IllegalArgumentException](SchemaOps.normalizeNames(df))
  }

  test("enforce casts, reorders, and prunes to target schema") {
    val df = Seq((1L, "x", 2.5)).toDF("id", "s", "v")
    val target = StructType(Seq(
      StructField("v", DecimalType(10, 2)),
      StructField("id", StringType)))
    val out = SchemaOps.enforce(df, target)
    assert(out.columns.toSeq == Seq("v", "id"))
    assert(out.schema("v").dataType == DecimalType(10, 2))
    val row = out.head()
    assert(row.getString(1) == "1")
  }

  test("enforce fails fast on missing column") {
    val df = Seq((1L, "x")).toDF("id", "s")
    val target = StructType(Seq(StructField("nope", StringType)))
    assertThrows[IllegalArgumentException](SchemaOps.enforce(df, target))
  }

  test("row hash matches reference format: md5('(' + joined + ')') with null->''") {
    // golden values precomputed: md5("(1,a)"), md5("(1,,x)")
    val df = Seq((1, Some("a"), "ignored"), (1, None, "x")).toDF("i", "s", "t")
    val out = Audit.addRowHash(df, Seq("i", "s"), "h").select("h").as[String].collect()
    assert(out(0) == "d4003cc6a9e83808846664c712882b46")
    // second row hashes ("1", "") — null becomes empty string
    val out2 = Audit.addRowHash(df, Seq("i", "s", "t"), "h")
      .where($"s".isNull).select("h").as[String].head()
    assert(out2 == "616d5dc04324a5b82395dcfa3325dd2e")
  }

  test("audit columns added with declared values") {
    val df = Seq((1, "x")).toDF("id", "s")
    val out = Audit.addAuditColumns(df, updatedBy = "me", runId = 7L)
    assert(out.columns.toSeq ==
      Seq("id", "s", "updatedby", "updated_utc_ts", "runid"))
    val row = out.select("updatedby", "runid").head()
    assert(row.getString(0) == "me" && row.getLong(1) == 7L)
    assert(out.schema("updated_utc_ts").dataType == TimestampType)
  }

  test("referenceCompatPass widens bool/byte to int16, applies decimal targets") {
    val df = Seq((true, 1.toByte, 1.5)).toDF("b", "t", "d")
    val out = CompatCasts.referenceCompatPass(df,
      decimalTargets = Map("d" -> DecimalType(10, 2)))
    assert(out.schema("b").dataType == ShortType)
    assert(out.schema("t").dataType == ShortType)
    assert(out.schema("d").dataType == DecimalType(10, 2))
    val row = out.head()
    assert(row.getShort(0) == 1.toShort)
  }

  test("colsWithType selects by predicate (O-5)") {
    val df = Seq((1L, "x", 2.0)).toDF("a", "b", "c")
    assert(CompatCasts.colsWithType(df)(_ == LongType) == Seq("a"))
    assert(CompatCasts.colsWithType(df)(
      t => t == LongType || t == DoubleType) == Seq("a", "c"))
  }

  test("castColumns casts exactly the named columns") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val out = CompatCasts.castColumns(df, Seq("b"), StringType)
    assert(out.schema("a").dataType == LongType)
    assert(out.schema("b").dataType == StringType)
  }
}
