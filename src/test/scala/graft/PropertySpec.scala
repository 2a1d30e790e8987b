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

  test("mixture rates: closed form holds for arbitrary domain counts and targets") {
    import graft.ops.Sampling
    val caseGen = for {
      nDomains <- Gen.chooseNum(1, 5)
      counts <- Gen.listOfN(nDomains, Gen.chooseNum(1L, 10000L))
      targets <- Gen.listOfN(nDomains, Gen.chooseNum(0, 1000))
    } yield (counts, targets)
    samples(caseGen, 20).foreach { case (counts, targets) =>
      val rows = counts.zipWithIndex.flatMap { case (n, d) =>
        (0L until n).map(i => (d.toLong * 100000 + i, s"d$d"))
      }
      val df = rows.toDF("id", "dom")
      val targetMap = targets.zipWithIndex.map { case (t, d) => s"d$d" -> t }.toMap
      val total = counts.sum
      val got = Sampling.mixtureRatesMilli(df, "dom", targetMap)
        .select("dom", "rate_milli").as[(String, Long)].collect().toMap
      targetMap.foreach { case (dom, t) =>
        val n = counts(dom.drop(1).toInt)
        assert(got(dom) == math.min(1000L, t.toLong * total / n),
          s"$dom t=$t n=$n total=$total")
      }
    }
  }

  test("fp60 is non-negative, 60-bit, and injective over distinct test keys") {
    import graft.ops.IncrementalDedup
    val keys = samples(Gen.asciiPrintableStr.suchThat(_.nonEmpty), 100).distinct
    val fps = keys.toDF("k")
      .select(IncrementalDedup.fp60(col("k")).as("fp"))
      .as[Long].collect()
    assert(fps.forall(f => f >= 0L && f < (1L << 60)))
    assert(fps.distinct.length == fps.length) // no collisions in sample
  }
}
