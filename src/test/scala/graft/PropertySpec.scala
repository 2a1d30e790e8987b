package graft

import graft.ops.{Audit, JsonLog, LogContext, SchemaOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based coverage (SURVEY.md §5 item 3), via ScalaCheck
  * generators sampled under a fixed seed (no scalatestplus bridge in
  * the offline cache — sampling keeps runs deterministic anyway).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int = 100): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("normalizeName is idempotent and never emits spaces/hyphens/double underscores") {
    val nameGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.const(' '), Gen.const('-'), Gen.const('_')))
      .map(_.mkString)
    samples(nameGen).foreach { n =>
      val once = SchemaOps.normalizeName(n)
      assert(SchemaOps.normalizeName(once) == once, s"input '$n'")
      assert(!once.contains(" ") && !once.contains("-") && !once.contains("__"),
        s"input '$n' -> '$once'")
    }
  }

  test("short values survive int16 widening round-trip (bit/tinyint contract)") {
    val vals = samples(Gen.chooseNum(Short.MinValue, Short.MaxValue), 50)
    val df = vals.map(_.toInt).toDF("x")
    val out = df.select(col("x").cast(ShortType).cast(IntegerType).as("x"))
      .as[Int].collect()
    assert(out.toSeq == vals.map(_.toInt))
  }

  test("row hash is insensitive to non-hashed column changes, sensitive to hashed ones") {
    val rows = Seq((1L, "a", "noise1"), (1L, "a", "noise2"), (2L, "a", "x"))
    val df = rows.toDF("k", "s", "extra")
    val hashes = Audit.addRowHash(df, Seq("k", "s"), "h")
      .select("h").as[String].collect()
    assert(hashes(0) == hashes(1)) // extra column differs, hash equal
    assert(hashes(0) != hashes(2)) // hashed column differs
  }

  test("JsonLog lines are parseable JSON with the reference field set") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    samples(Gen.asciiPrintableStr).foreach { msg =>
      val line = JsonLog.line(LogContext("job", 1L, Map("table" -> "t")),
        "INFO", msg, 1700000000000L)
      val node = mapper.readTree(line)
      assert(node.get("message").asText() == msg)
      assert(node.get("epoch_time").asText() == "1700000000000")
      assert(node.get("job_name").asText() == "job")
    }
  }

  test("decimal cast parity: cent-valued doubles are exact in DECIMAL(18,2)") {
    val cents = samples(Gen.chooseNum(-100000000L, 100000000L), 50)
    val df = cents.map(c => (BigDecimal(c) / 100).toDouble).toDF("x")
    val back = df.select(col("x").cast(DecimalType(18, 2)).as("d")).collect()
      .map(r => BigDecimal(r.getDecimal(0)))
    assert(back.toSeq == cents.map(c => BigDecimal(c) / 100))
  }
}
