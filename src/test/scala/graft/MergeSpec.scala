package graft

import java.nio.file.Files
import graft.sources.Merge
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {

  private def fileSet(dir: String): Set[(String, Long)] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Set.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length())).toSet
  }

  test("partition-scoped upsert rewrites only touched partitions") {
    val out = Files.createTempDirectory("graft_merge").toString + "/orders"
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orders.write.partitionBy("o_orderstatus").parquet(out)
    val statuses = orders.select("o_orderstatus").distinct()
      .collect().map(_.getString(0)).sorted
    assert(statuses.length >= 2)
    val (touchedStatus, untouchedStatus) = (statuses.head, statuses.last)
    val untouchedBefore = fileSet(s"$out/o_orderstatus=$untouchedStatus")
    val total = orders.count()

    // updates: re-price 5 existing keys + insert 1 new key, all in ONE status
    val existing = orders.where(col("o_orderstatus") === touchedStatus).limit(5)
      .withColumn("o_totalprice", lit(999.99))
    val novel = orders.where(col("o_orderstatus") === touchedStatus).limit(1)
      .withColumn("o_orderkey", lit(-1L))
    val updates = existing.unionByName(novel)

    val rewritten = Merge.upsertPartitioned(spark, out, updates,
      Seq("o_orderkey"), "o_orderstatus")
    assert(rewritten == 1)

    val after = spark.read.parquet(out)
    assert(after.count() == total + 1) // 5 replaced in place, 1 inserted
    val repriced = after.where(col("o_totalprice") === 999.99).count()
    assert(repriced == 5)
    assert(after.where(col("o_orderkey") === -1L).count() == 1)

    // the untouched partition's files were not rewritten
    assert(fileSet(s"$out/o_orderstatus=$untouchedStatus") == untouchedBefore)
  }

  test("applyChanges: deletes go, upserts land, an emptied partition's files are cleared") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_cdc").toString + "/t"
    Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2"), (4L, "d", "p3"))
      .toDF("k", "v", "part").write.partitionBy("part").parquet(out)
    val untouchedBefore = fileSet(s"$out/part=p1")

    // delete k=3 (empties p2), update k=4, insert k=5 — p1 untouched
    val changes = Seq(
      (3L, null.asInstanceOf[String], "p2", "delete"),
      (4L, "D", "p3", "update"),
      (5L, "e", "p3", "insert"))
      .toDF("k", "v", "part", "change_type")
    val n = graft.sources.Merge.applyChanges(spark, out, changes,
      Seq("k"), "part")
    assert(n == 2)

    val after = spark.read.parquet(out)
      .select("k", "v", "part").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(after == Seq((1L, "a", "p1"), (2L, "b", "p1"),
      (4L, "D", "p3"), (5L, "e", "p3")))
    // the partition whose last row was deleted holds no stale files
    assert(!new java.io.File(s"$out/part=p2").exists())
    // and the untouched partition was never rewritten
    assert(fileSet(s"$out/part=p1") == untouchedBefore)
  }
}
