package graft.tools

import org.apache.spark.sql.functions._

/** Optimization-round diagnostic: q133's per-round LPA plan is
  * invisible to `graft.Explain` (each round eagerly localCheckpoints,
  * so the returned query plan is a scan of the last checkpoint) —
  * this probe rebuilds ONE round over the q133 edge set and prints
  * its `explain("formatted")`, so the per-round exchange count is
  * auditable. Mirrors LabelPropagation.run's round body; if that
  * changes, change this.
  *
  * Usage: runMain graft.tools.ProbeRoundPlan [sfDir]
  */
object ProbeRoundPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    val e0 = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    val e = e0.select(col("src").cast("long").as("u"),
        col("dst").cast("long").as("v"))
      .where(col("u") =!= col("v"))
    // SPARK_GRAFT_LPA_SHAPE=old replays the r10-r14 round shape (no
    // pre-partitioned cache, two-step argmax) for the plan diff
    val old = sys.env.get("SPARK_GRAFT_LPA_SHAPE").contains("old")
    val adjBase = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .distinct()
    val adj = (if (old) adjBase else adjBase.repartition(col("v"))).persist()
    adj.count() // materialize the cache, as run() does before round 1
    val labels = adj.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .localCheckpoint(true)
    val byNode = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("c").desc, col("nl"))
    val nbrCounts = adj.join(labels, adj("v") === labels("node"))
      .select(col("u"), col("lbl").as("nl"))
      .groupBy("u", "nl").agg(count(lit(1)).as("c"))
    val round =
      if (old) {
        val mc = nbrCounts.groupBy("u").agg(max("c").as("mc"))
        nbrCounts.join(mc, "u")
          .where(col("c") === col("mc"))
          .groupBy("u").agg(min("nl").cast("long").as("lbl"))
          .select(col("u").as("node"), col("lbl"))
      } else nbrCounts
        .withColumn("rn", row_number().over(byNode))
        .where(col("rn") === 1)
        .select(col("u").as("node"), col("nl").cast("long").as("lbl"))
    println("===== lpa one round =====")
    round.explain("formatted")
    spark.stop()
  }
}
