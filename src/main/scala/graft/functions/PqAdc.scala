package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native ADC distance: `sum_s lut(s)(codes(s))` — a candidate's
  * approximate distance as `m` compiled array lookups over primitive
  * longs.
  *
  * The HOF formulation (`aggregate(zip_with(codes, lut, (c, r) ->
  * element_at(r, c + 1)), 0L, (a, x) -> a + x)`,
  * [[graft.ops.Pq.adcDistanceHof]]) is CodegenFallback — per
  * candidate-pair it allocates a zipped array and interprets two
  * lambdas. This expression is the scan every ADC probe runs over
  * (candidates x queries rows), so it is the probe's hot loop.
  *
  * Null semantics match the HOF chain: a codes/lut length mismatch or
  * an out-of-range code yields NULL (zip_with pads with null,
  * element_at of a bad index is null, and null poisons the sum) —
  * neither occurs for codes produced by [[PqEncodeCodes]] against the
  * model that built the LUT; parity spec in PqSpec.
  */
case class PqAdcDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(codes: Any, lut: Any): Any =
    PqAdcDistance.dist(codes.asInstanceOf[ArrayData],
      lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.freshName("adcDist")
    nullSafeCodeGen(ctx, ev, (c, l) => s"""
      Long $d = graft.functions.PqAdcDistance.dist($c, $l);
      if ($d == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $d.longValue(); }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqAdcDistance =
    copy(left = newLeft, right = newRight)
}

object PqAdcDistance {

  /** Static entry shared by interpreted eval and codegen; null on the
    * HOF chain's null-producing shapes (length mismatch, bad code).
    */
  def dist(codes: ArrayData, lut: ArrayData): java.lang.Long = {
    val m = codes.numElements()
    if (lut.numElements() != m) return null
    var acc = 0L
    var s = 0
    while (s < m) {
      val row = lut.getArray(s)
      val c = codes.getInt(s)
      if (c < 0 || c >= row.numElements()) return null
      acc += row.getLong(c)
      s += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Column API: ADC distance of a codes column against a per-row
    * (per-query) LUT column.
    */
  def distance(codes: Column, lut: Column): Column =
    ColumnBridge.column(PqAdcDistance(
      ColumnBridge.expression(codes), ColumnBridge.expression(lut)))
}
