package graft

import graft.functions.Theta
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ThetaSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(xs: Seq[Long]) =
    xs.toDF("v").repartition(8)
      .agg(Theta.sketchAgg(col("v")).as("sk")).head().getAs[Array[Byte]]("sk")

  test("exact mode below k: estimates equal true distinct counts, set algebra exact") {
    val a = (1L to 900L)
    val b = (601L to 1500L)
    val (ska, skb) = (sketchOf(a), sketchOf(b))
    assert(Theta.isExact(ska) && Theta.isExact(skb))
    assert(Theta.estimate(ska) == 900.0)
    assert(Theta.estimate(Theta.intersect(ska, skb)) == 300.0)
    assert(Theta.estimate(Theta.aNotB(ska, skb)) == 600.0)
    assert(Theta.estimate(Theta.union(ska, skb)) == 1500.0)
  }

  test("estimation mode: union/intersect/diff within 5% of exact at 200k") {
    val rnd = new scala.util.Random(23)
    val a = Seq.fill(200000)(rnd.nextLong().abs % 300000L).distinct
    val b = Seq.fill(200000)(rnd.nextLong().abs % 300000L + 150000L).distinct
    val (sa, sb) = (a.toSet, b.toSet)
    val (ska, skb) = (sketchOf(a), sketchOf(b))
    def ok(est: Double, exact: Int) =
      math.abs(est - exact) <= exact * 0.05 + 2
    assert(ok(Theta.estimate(ska), sa.size))
    assert(ok(Theta.estimate(Theta.intersect(ska, skb)), (sa & sb).size))
    assert(ok(Theta.estimate(Theta.aNotB(ska, skb)), (sa -- sb).size))
    assert(ok(Theta.estimate(Theta.union(ska, skb)), (sa | sb).size))
  }

  test("duplicates and re-delivery are absorbed (set semantics)") {
    val once = sketchOf(1L to 500L)
    val thrice = sketchOf((1L to 500L) ++ (1L to 500L) ++ (1L to 500L))
    assert(Theta.estimate(thrice) == Theta.estimate(once))
  }

  test("nulls are skipped; grouped agg runs as partial ObjectHashAggregate") {
    val sk = Seq(Some(1L), None, Some(2L)).toDF("v")
      .agg(Theta.sketchAgg(col("v")).as("sk")).head().getAs[Array[Byte]]("sk")
    assert(Theta.estimate(sk) == 2.0)
    val plan = (1 to 1000).map(i => (i % 3, i.toLong)).toDF("g", "v")
      .repartition(8).groupBy("g").agg(Theta.sketchAgg(col("v")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.toLowerCase.contains("partial_theta_sketch_agg"), plan)
  }
}
