package graft

import graft.ops.Cents
import graft.queries.dec
import org.apache.spark.sql.functions._

/** The long-cents fast path must be BIT-identical to the decimal
  * oracle-parity path on 2-dp data — same exact integer sums, same
  * single final IEEE division.
  */
class CentsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = Tables(spark, "/root/testdata/sf0.01", "lineitem")

  test("cents aggregation equals decimal aggregation on lineitem sf0.01") {
    val decimalPath = li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice")) *
          (lit(1).cast(org.apache.spark.sql.types.DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"))
    val centsPath = li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        Cents.sumUnits(col("l_quantity")).as("sum_qty"),
        Cents.sumProdComplement(col("l_extendedprice"), col("l_discount"))
          .as("sum_disc_price"),
        Cents.avgUnits(col("l_quantity"), count(lit(1))).as("avg_qty"))
    val d = decimalPath.orderBy("l_returnflag", "l_linestatus").collect()
    val c = centsPath.orderBy("l_returnflag", "l_linestatus").collect()
    assert(d.length == c.length && d.nonEmpty)
    d.zip(c).foreach { case (dr, cr) =>
      // bitwise comparison — exact integers + one IEEE division each
      Seq("sum_qty", "sum_disc_price", "avg_qty").foreach { f =>
        assert(java.lang.Double.doubleToLongBits(dr.getAs[Double](f))
          == java.lang.Double.doubleToLongBits(cr.getAs[Double](f)),
          s"$f: ${dr.getAs[Double](f)} vs ${cr.getAs[Double](f)}")
      }
    }
  }

  test("cents aggregate stays a HashAggregate over primitive longs") {
    val plan = li.groupBy("l_returnflag")
      .agg(Cents.sumUnits(col("l_quantity")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }

  test("round-half-up matches decimal cast on representative edge values") {
    // doubles near .xx5 boundaries: both paths must agree on the cent
    val df = Seq(0.005, 1.115, 2.675, 99.994, 100.0, 0.01, 12345.67)
      .toDF("v")
    val both = df.agg(
      sum(dec(col("v"))).cast("double").as("d"),
      Cents.sumUnits(col("v")).as("c")).head()
    assert(java.lang.Double.doubleToLongBits(both.getAs[Double]("d"))
      == java.lang.Double.doubleToLongBits(both.getAs[Double]("c")),
      s"${both.getAs[Double]("d")} vs ${both.getAs[Double]("c")}")
  }
}
