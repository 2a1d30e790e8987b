package graft

import graft.queries.VectorQueries
import org.apache.spark.sql.DataFrame

/** Lifecycle contract of the q171/q172 shared NN-Descent graph cache
  * (VectorQueries.cachedGraph). The claims under test are load-bearing
  * for gate wall-time: same-session same-params callers share ONE
  * build; concurrent sessions neither serialize behind each other's
  * builds nor leak frames across sessions; a GC-cleared SoftReference
  * is benign (the graph rebuilds).
  */
class GraphCacheSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  // small params: the spec tests the CACHE, not graph quality
  private def graph(s: org.apache.spark.sql.SparkSession): DataFrame =
    VectorQueries.cachedGraph(s, dir, k = 4, initBuckets = 8, iterations = 1)

  test("same session + params returns the identical cached frame") {
    val a = graph(spark)
    val b = graph(spark)
    assert(a eq b, "second call must reuse the first build")
    assert(a.count() > 0)
    // a different param tuple is a different cache entry
    val c = VectorQueries.cachedGraph(spark, dir, k = 5, initBuckets = 8,
      iterations = 1)
    assert(!(c eq a))
  }

  test("concurrent sessions get distinct frames, each bound to its own session") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    // real concurrency: a deadlock between the global monitor and the
    // per-session monitors would hang this join; a cross-session leak
    // would hand one thread a frame rooted in the other's session
    val results = new java.util.concurrent.ConcurrentHashMap[Int, DataFrame]()
    val ts = Seq(s1 -> 1, s2 -> 2).map { case (s, i) =>
      new Thread(() => { results.put(i, graph(s)); () })
    }
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    val (g1, g2) = (results.get(1), results.get(2))
    assert(g1 != null && g2 != null, "a build thread hung or died")
    assert(!(g1 eq g2), "sessions must not share one cached frame")
    assert(g1.sparkSession eq s1)
    assert(g2.sparkSession eq s2)
    // and each session's entry is itself stable on reuse
    assert(graph(s1) eq g1)
    assert(graph(s2) eq g2)
  }

  test("a cleared SoftReference rebuilds instead of failing (cache loss is benign)") {
    val s = spark.newSession()
    val first = graph(s)
    val n = first.count()
    // simulate the GC clearing the soft ref under memory pressure
    VectorQueries.evictGraphCache(s)
    val rebuilt = graph(s)
    assert(!(rebuilt eq first), "eviction must force a fresh build")
    assert(rebuilt.count() == n, "rebuild must reproduce the graph shape")
    // the rebuilt entry is cached again
    assert(graph(s) eq rebuilt)
  }
}
