package graft

import graft.ops.PageRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replay of the exact integer recurrence. */
  private def reference(edges: Seq[(String, String, Long)], iters: Int,
                        damp: Int = 85): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val base = ((100L - damp) * 1000000L / 100L) / n
    var pr = nodes.map(_ -> 1000000L / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, w) => (pr(s) * w) / outw(s) }.sum
      }
      pr = nodes.map(v => v -> (base + (damp * contrib.getOrElse(v, 0L)) / 100)).toMap
    }
    pr
  }

  private def run(edges: Seq[(String, String, Long)], iters: Int) =
    PageRank.run(edges.toDF("src", "dst", "w").repartition(7), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("matches the integer recurrence on a hand-built graph (hub, cycle, dangling)") {
    val edges = Seq(
      ("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L), ("c", "a", 5L),
      ("d", "a", 1L), // d has no in-edges -> floor at base
      ("b", "e", 1L)) // e dangles: mass leaks, deterministically
    for (iters <- Seq(1, 4, 8)) {
      assert(run(edges, iters) == reference(edges, iters), s"iters=$iters")
    }
  }

  test("seeded random graph: distributed result equals driver recurrence exactly") {
    val rnd = new scala.util.Random(19)
    val nodes = (0 until 40).map(i => s"n$i")
    val edges = (0 until 300).map { _ =>
      (nodes(rnd.nextInt(40)), nodes(rnd.nextInt(40)), 1L + rnd.nextInt(9))
    }.distinct.map { case (s, d, w) => (s, d, w) }
    assert(run(edges, 8) == reference(edges, 8))
  }

  test("ranks order follows link structure") {
    // every leaf points at 'hub'; hub returns its mass to leaf1 only.
    // So hub outranks the unreferenced leaves 2..6 (they sit at the
    // teleport floor), and leaf1 — sole heir of hub's mass — outranks
    // hub itself.
    val edges = (1 to 6).map(i => (s"leaf$i", "hub", 1L)) :+ (("hub", "leaf1", 1L))
    val pr = run(edges, 8)
    assert((2 to 6).forall(i => pr("hub") > pr(s"leaf$i")))
    assert(pr("leaf1") > pr("hub"))
  }
}
