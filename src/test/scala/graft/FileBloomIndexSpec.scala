package graft

import graft.ops.{FileBloomIndex, Generations}
import org.apache.spark.sql.functions._

class FileBloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_fbi_$tag").toString

  private def writeData(path: String, ids: Range, nFiles: Int): Unit =
    spark.range(ids.start, ids.end).toDF("id")
      .withColumn("payload", md5(col("id").cast("string")))
      .repartition(nFiles)
      .write.mode("append").parquet(path)

  test("point lookup == full-scan filter; absent keys return empty") {
    val data = scratch("eq") + "/t"
    writeData(data, 0 until 16000, 16)
    val side = scratch("eq_side") + "/idx"
    FileBloomIndex.build(spark, data, "id", side,
      expectedPerFile = 2000, fpp = 0.01)

    val keys = Seq(7L, 9001L, 15999L)
    val got = FileBloomIndex.pointLookup(spark, data, side, "id", keys)
      .select("id", "payload").as[(Long, String)].collect().sortBy(_._1).toSeq
    val want = spark.read.parquet(data).where(col("id").isin(keys: _*))
      .select("id", "payload").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == want && got.size == 3)

    assert(FileBloomIndex.pointLookup(spark, data, side, "id",
      Seq(999999L)).count() == 0)
  }

  test("the sidecar actually prunes: a point probe touches few of many files") {
    val data = scratch("prune") + "/t"
    writeData(data, 0 until 16000, 16)
    val side = scratch("prune_side") + "/idx"
    FileBloomIndex.build(spark, data, "id", side,
      expectedPerFile = 2000, fpp = 0.001)
    val total = spark.read.parquet(data).inputFiles.length
    assert(total == 16)
    val cand = FileBloomIndex.candidateFiles(spark, data, side, Seq(1234L))
    // the key lives in exactly one file; fpp=0.001 over 15 others
    // makes >3 survivors astronomically unlikely
    assert(cand.nonEmpty && cand.size <= 3,
      s"expected <=3 candidate files of $total, got ${cand.size}")
    // absent key: candidates may be nonempty (false positives) but the
    // pruned read returns nothing
    val none = FileBloomIndex.candidateFiles(spark, data, side, Seq(777777L))
    assert(none.size <= 3)
  }

  test("stale sidecar is safe: appended files are always candidates; refresh covers them") {
    val data = scratch("stale") + "/t"
    writeData(data, 0 until 8000, 8)
    val side = scratch("stale_side") + "/idx"
    FileBloomIndex.build(spark, data, "id", side,
      expectedPerFile = 2000, fpp = 0.001)
    // append AFTER the build — the sidecar does not know these files
    writeData(data, 100000 until 104000, 4)
    assert(FileBloomIndex.uncoveredFiles(spark, data, side).length == 4)

    // a key that lives only in the appended files MUST still be found
    val got = FileBloomIndex.pointLookup(spark, data, side, "id", Seq(100123L))
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(100123L), "stale sidecar lost an appended row")

    // refresh scans only the 4 new files and restores full coverage
    assert(FileBloomIndex.refresh(spark, data, "id", side,
      expectedPerFile = 2000, fpp = 0.001) == 4)
    assert(FileBloomIndex.uncoveredFiles(spark, data, side).isEmpty)
    // coverage restored => the appended-only key now prunes too
    val cand = FileBloomIndex.candidateFiles(spark, data, side, Seq(100123L))
    assert(cand.size <= 3, s"post-refresh probe should prune, got ${cand.size}")
    assert(FileBloomIndex.refresh(spark, data, "id", side) == 0)
  }

  test("versioned lifecycle: pointer flip publishes, superseded generation intact") {
    val data = scratch("gen") + "/t"
    writeData(data, 0 until 4000, 4)
    val root = scratch("gen_side") + "/idx"
    val g1 = FileBloomIndex.buildVersioned(spark, data, "id", root,
      expectedPerFile = 2000, fpp = 0.001)
    assert(Generations.livePath(spark, root) == g1)
    val viaLive = FileBloomIndex.pointLookup(spark, data,
      Generations.livePath(spark, root), "id", Seq(42L)).count()
    assert(viaLive == 1)

    writeData(data, 50000 until 54000, 4)
    val g2 = FileBloomIndex.buildVersioned(spark, data, "id", root,
      expectedPerFile = 2000, fpp = 0.001)
    assert(Generations.livePath(spark, root) == g2 && g2 != g1)
    // superseded generation still serves in-flight probes (stale but safe)
    assert(FileBloomIndex.pointLookup(spark, data, g1, "id",
      Seq(50042L)).count() == 1)
    // new generation covers everything
    assert(FileBloomIndex.uncoveredFiles(spark, data, g2).isEmpty)
  }
}
