package graft

import org.apache.spark.sql.SparkSession

/** Driver bench contract: run every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line
  * {"metric":...,"value":total_sec,"queries":{name:sec},"sf":...}.
  *
  * Queries run in sorted name order after a session warmup action so
  * per-query numbers measure the query, not JVM/session init.
  *
  * == Load robustness ==
  * A single timed run is not a measurement on a shared host: a
  * transient page-cache or CPU squeeze lands directly in the artifact
  * of record and reads as a phantom 10-50x regression (BENCH_r04
  * recorded 70 s for a 0.9 s query on a fixed 500-row table while a
  * concurrent experiment churned the box). Defense in depth:
  *   1. every query is timed TWICE and the minimum kept — the min of
  *      two runs is robust to any squeeze shorter than one run;
  *   2. if the min still exceeds 5x that query's sf0.001 warmup wall
  *      (scaled queries legitimately exceed it; fixed-table queries
  *      cannot) AND exceeds 2 s absolute, a third run is taken —
  *      sustained-load insurance for exactly the implausible tail;
  *   3. SUSPECT flagging: under SUSTAINED host load all runs are slow
  *      and min-of-N silently reads as a huge regression (the round-8
  *      driver artifact reported 22x outliers an idle-host replay put
  *      at 1x). A query whose final wall STILL exceeds 5x its warmup
  *      anchor (and 2 s absolute) after the rerun is marked in the
  *      artifact's `"suspect"` map, with the 1-minute load average
  *      sampled right after it in `"loads"` — a polluted artifact is
  *      machine-visible instead of indistinguishable from a
  *      regression;
  *   4. the 1-minute load average is also sampled before and after
  *      the whole run (`load_avg_start`/`load_avg_end`), and the MAX
  *      per-query sample is surfaced as `load_max_during`;
  *   5. SPARK_GRAFT_BENCH_PASSES=N (default 1) repeats the whole
  *      sweep N times and keeps the per-query min ACROSS passes —
  *      the run-of-record defense against uniform ambient drift that
  *      min-of-2-within-one-pass cannot see (the r13 close read ~32%
  *      over the same binary's mid-round number with a clean start
  *      load and zero suspects); `pass_totals` carries each pass's
  *      sum so cross-pass drift is visible in the artifact itself.
  *
  * == Artifact schema ==
  * One JSON object: `metric`/`value`/`unit` (total seconds over all
  * queries), `queries` (name → min wall sec), `errors` (name →
  * message, only failing queries), `suspect` (name → true, only
  * queries failing the plausibility check above — read these walls as
  * "host was contended", not "engine regressed"), `loads` (name →
  * 1-min load average sampled after that query; -1 where the JVM
  * can't provide one), `floor_sec` (median wall of a trivial 32-task
  * job — the harness cost floor), `runs_per_query`, `outlier_reruns`,
  * `load_avg_start`/`load_avg_end`, `sf`.
  */
object Bench {
  private def loadAvg(): Double =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    catch { case _: Throwable => -1.0 }

  /** The plausibility check behind the `suspect` flag: the kept wall
    * (already min-of-2-or-3) still exceeds 5x the query's sf0.001
    * warmup anchor AND 2 s absolute. No anchor (warmup dir missing or
    * query crashed in warmup) → never suspect: flagging needs
    * evidence, and the correctness gate owns crash detection.
    */
  def isSuspect(bestSec: Double, anchorSec: Option[Double]): Boolean =
    anchorSec.exists(a => bestSec > a * 5.0 && bestSec > 2.0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same session recipe as Verify: GraftSession (configs +
    // injected extensions), so the bench times the real engine plans
    val spark = GraftSession.local()
    val load0 = loadAvg()

    // warmup: executor threads once, then each query once at the
    // smallest scale factor so the timed run measures steady-state
    // execution, not one-time codegen/JIT compilation (which is noise
    // at any real scale). Warmup walls double as per-query plausibility
    // anchors for the timed run (see scaladoc).
    spark.range(1000000).selectExpr("sum(id)").collect()
    val warmDir = "/root/testdata/sf0.001"
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    val warmWalls: Map[String, Double] =
      if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
        sorted.map { case (name, fn) =>
          val t0 = System.nanoTime()
          try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
          name -> (System.nanoTime() - t0) / 1e9
        }.toMap
      } else Map.empty

    // a crashing query must never read as a fast win in the artifact
    // of record: the wall is still measured, but the error rides along
    // and lands in the JSON's "errors" map — the correctness gate
    // catches breakage too, but the bench artifact has to be honest on
    // its own
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case t: Throwable =>
          Some(s"${t.getClass.getSimpleName}: ${String.valueOf(t.getMessage).take(200)}") }
      ((System.nanoTime() - t0) / 1e9, err)
    }

    var rerunCount = 0
    def runPass(): Seq[(String, Double, Option[String], Double)] =
      sorted.map { case (name, fn) =>
        val (w1, e1) = timeOnce(fn)
        val (w2, e2) = timeOnce(fn)
        val best2 = math.min(w1, w2)
        val anchor = warmWalls.get(name)
        val (best, err3) =
          if (isSuspect(best2, anchor)) {
            rerunCount += 1
            val (w3, e3) = timeOnce(fn)
            (math.min(best2, w3), e3)
          } else (best2, None)
        (name, best, e1.orElse(e2).orElse(err3), loadAvg())
      }
    // run-of-record passes (round 14): min-of-2-per-query is robust to
    // squeezes shorter than one run, but the r13 close drifted ~32%
    // above the same binary's mid-round number under UNIFORM ambient
    // contention that no per-query check can see (start-load was 0.47
    // and nothing was suspect). SPARK_GRAFT_BENCH_PASSES=2 runs the
    // whole sweep twice and keeps the per-query min across passes —
    // sustained drift must now persist across the full wall-clock of
    // both sweeps to pollute the artifact; pass_totals exposes the
    // drift directly when it happens. Default 1 (the driver's run).
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES")
      .map(_.toInt).getOrElse(1).max(1)
    val allPasses = (1 to passes).map(_ => runPass())
    val passTotals = allPasses.map(_.map(_._2).sum)
    val results = sorted.map(_._1).zipWithIndex.map { case (name, i) =>
      val runs = allPasses.map(_(i))
      val best = runs.map(_._2).min
      (name, best, runs.flatMap(_._3).headOption,
        isSuspect(best, warmWalls.get(name)), runs.map(_._4).max)
    }
    val qs = results.map { case (k, v, _, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // full JSON string escaping (shared impl — JsonLog.esc): Spark
    // exception messages routinely carry newlines (multi-line
    // AnalysisException) and other control chars, any of which would
    // make the artifact line invalid JSON
    val errs = results.collect { case (k, _, Some(e), _, _) =>
      "\"" + k + "\":\"" + graft.ops.JsonLog.esc(e) + "\""
    }.mkString("{", ",", "}")
    val suspects = results.collect { case (k, _, _, true, _) =>
      "\"" + k + "\":true"
    }.mkString("{", ",", "}")
    val loads = results.map { case (k, _, _, _, l) => "\"" + k + "\":" + l }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // calibrated per-query overhead floor: the median wall of a
    // trivial narrow 32-task job — plan analysis + DAG scheduling +
    // task dispatch, none of it engine work. Reported so per-query
    // numbers can be read net of harness cost.
    val floorRuns = (1 to 11).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0L, 1000000L, 1L, 32).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val floor = floorRuns(floorRuns.length / 2)
    val load1 = loadAvg()
    val loadMax = results.map(_._5).max
    val passTotalsJson = passTotals.map(t => f"$t%.3f").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"suspect":$suspects,"loads":$loads,"floor_sec":$floor,"runs_per_query":2,"passes":$passes,"pass_totals":$passTotalsJson,"load_max_during":$loadMax,"outlier_reruns":$rerunCount,"load_avg_start":$load0,"load_avg_end":$load1,"sf":"$sfDir"}"""
    println(line)
    // the artifact of record must survive a stdout capture that only
    // keeps the tail (BENCH_r06 preserved 55 of 107 per-query walls);
    // the file carries the complete line regardless
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try {
      val w = new java.io.PrintWriter(new java.io.File(out), "UTF-8")
      try w.println(line) finally w.close()
    } catch { case t: Throwable =>
      System.err.println(s"bench: could not write $out: ${t.getMessage}") }
    spark.stop()
  }
}
