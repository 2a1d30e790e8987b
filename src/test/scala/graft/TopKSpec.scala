package graft

import graft.functions.TopKAgg
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TopKAgg: the bounded mergeable aggregator must exactly equal the
  * row_number window form under the same total order (key desc, id
  * asc), and must run as a real partial aggregation — that equality
  * plus the plan shape is the whole point of the operator.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int, groups: Int, keySpread: Int) = {
    val rnd = new scala.util.Random(7)
    // keySpread small => many exact ties => tie-break is exercised
    (1 to n).map(i =>
        (rnd.nextInt(groups).toLong, rnd.nextInt(keySpread).toLong, i.toLong))
      .toDF("g", "key", "id")
      .repartition(8) // force multi-partition partial aggregation
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val topk = udaf(TopKAgg(k))
    df.groupBy("g").agg(topk(col("key"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).as("rnk"),
        col("e._1").as("key"), col("e._2").as("id"))
  }

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("key").desc, col("id").asc)
    df.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("g"), col("rnk").cast("int"), col("key"), col("id"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

  test("equals the window form, including dense ties") {
    val df = fixture(5000, 40, 5)
    for (k <- Seq(1, 3, 10)) {
      assert(rows(viaAgg(df, k)) == rows(viaWindow(df, k)), s"k=$k")
    }
  }

  test("groups smaller than k emit all their rows, ordered") {
    val df = Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 5L, 3L)).toDF("g", "key", "id")
    assert(rows(viaAgg(df, 5)) == rows(viaWindow(df, 5)))
  }

  test("merge is associative and order-insensitive (seeded summaries)") {
    val agg = TopKAgg(4)
    val rnd = new scala.util.Random(11)
    val items = Vector.fill(200)((rnd.nextInt(20).toLong, rnd.nextLong().abs))
    val whole = items.foldLeft(agg.zero)(agg.reduce)
    // fold in 7 chunks, merge in a shuffled order
    val chunks = items.grouped(30).map(_.foldLeft(agg.zero)(agg.reduce)).toVector
    val merged = rnd.shuffle(chunks).foldLeft(agg.zero)(agg.merge)
    assert(merged == whole)
  }

  test("runs as ObjectHashAggregate with a partial stage, not a window sort") {
    val df = fixture(1000, 10, 100)
    val plan = viaAgg(df, 3).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.toLowerCase.contains("partial_topkagg"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
