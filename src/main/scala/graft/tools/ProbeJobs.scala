package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Optimization-round diagnostic: run one SparkEntry query with a
  * job listener attached and print every Spark job's wall time and
  * call site, so per-batch fixed costs (streaming gates run dozens of
  * small jobs) are attributable line-by-line. Not part of the bench
  * or verify contract.
  *
  * Usage: runMain graft.tools.ProbeJobs <queryName> [sfDir]
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
        ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, site) =>
          val ms = (System.nanoTime() - t0) / 1e6
          lines.add(f"JOB ${je.jobId}%4d ${ms}%9.1f ms  $site")
        }
        ()
      }
    })
    // warm up the session so JIT/codegen noise stays out of the probe
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    // two runs, like the bench: run 1 pays codegen/JIT, run 2 is the
    // steady state the bench's min-of-2 actually measures
    (1 to 2).foreach { run =>
      lines.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let listener events drain
      var sum = 0.0
      lines.forEach { l =>
        println(s"RUN$run $l")
        sum += l.split("\\s+")(2).toDouble
      }
      println(f"TOTAL run=$run $name wall=$wall%.3f s rows=$n " +
        f"jobs=${lines.size()} job_sum=${sum / 1000}%.3f s")
    }
    spark.stop()
  }
}
