package graft

/** Targeted per-query timing: `runMain graft.BenchOne q131 q126 …`
  * times only the named SparkEntry queries (prefix match allowed) on
  * SPARK_GRAFT_SF_DIR — the iterate-on-one-operator loop, without
  * paying the full 167-query bench per measurement. Two runs, min kept,
  * same discipline as [[Bench]].
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.range(1000000).selectExpr("sum(id)").collect()
    val picked = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      args.isEmpty || args.exists(a => n.startsWith(a))
    }
    picked.foreach { case (name, fn) =>
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      val (w1, c1) = once()
      val (w2, _) = once()
      println(f"BENCHONE $name%-28s ${math.min(w1, w2)}%8.3f s  rows=$c1")
    }
    spark.stop()
  }
}
