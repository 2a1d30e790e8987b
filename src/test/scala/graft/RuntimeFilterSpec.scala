package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: Spark's InjectRuntimeFilter
  * turns a selective filter on one join side into a bloom probe on
  * the OTHER side's scan, so the fact table sheds rows before the
  * exchange. At 100 TB this is a first-order cost lever the engine
  * leans on (GraftSession enables it explicitly); production
  * thresholds (10 GB application-side scan) are far above any local
  * fixture, so this spec lowers them to prove the injection fires
  * and the result is unchanged — pinning that a Spark upgrade or a
  * conf refactor can't silently drop the capability.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom probe into the fact side") {
    val dir = "/root/testdata/sf0.01"
    val confs = Seq(
      // thresholds sized so the fixture qualifies as "worth filtering"
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
      // runtime filters target shuffle joins; force one
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val part = spark.read.parquet(s"$dir/part.parquet")
        .where(col("p_size") === 1) // selective dim predicate
      val q = li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy("p_size").agg(sum("l_quantity").as("sum_qty"))

      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"expected a runtime bloom probe on the fact side:\n$plan")

      // semantics unchanged vs the filter disabled
      val withFilter = q.collect().toSeq
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy("p_size").agg(sum("l_quantity").as("sum_qty"))
        .collect().toSeq
      assert(withFilter == without)
    } finally {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      prev.foreach { case (k, v) => spark.conf.set(k, v) }
    }
  }
}
