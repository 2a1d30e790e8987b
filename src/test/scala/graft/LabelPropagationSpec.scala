package graft

import graft.ops.LabelPropagation
import org.apache.spark.sql.functions._

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replay of the exact recurrence: synchronous rounds,
    * most-frequent neighbor label, ties -> smallest label.
    */
  private def brute(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lbl = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(lbl).view.mapValues(_.size).toSeq
        n -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LabelPropagation.run(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("two cliques with one bridge resolve to two communities") {
    val cliqueA = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val cliqueB = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val edges = cliqueA ++ cliqueB ++ Seq((3L, 10L))
    val got = run(edges, 4)
    assert(got == brute(edges, 4), got.toString)
    // each clique coalesces to one label; the two labels differ
    val la = (0L to 3L).map(got).toSet
    val lb = (11L to 13L).map(got).toSet
    assert(la.size == 1 && lb.size == 1 && la != lb, got.toString)
  }

  test("matches the driver recurrence on a seeded random graph at 1..4 rounds") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 120).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2).distinct
    for (iters <- 1 to 4)
      assert(run(edges, iters) == brute(edges, iters), s"iters=$iters")
  }

  test("direction, duplicate edges and self-loops are normalized away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 3L))
    val clean = Seq((1L, 2L), (2L, 3L))
    assert(run(messy, 3) == run(clean, 3))
    // the self-loop-only node does not appear (no real neighbors)
    assert(!run(messy, 1).contains(4L))
  }
}
