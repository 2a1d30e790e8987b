package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native one-pass PQ encode: the `m` nearest-centroid codes of a
  * micro-quantized vector, computed in one compiled scan over
  * primitive longs.
  *
  * The HOF formulation ([[graft.ops.Pq.codesColumnHof]]) builds, per
  * row, `m` `transform`s over k-element literal-struct arrays with a
  * `slice` re-evaluated per centroid — and higher-order functions are
  * CodegenFallback in Spark, so every one of those m*k lambda
  * evaluations is interpreted and boxed. At m=8, k=16 that is ~50x the
  * work of the coarse-cell argmin and measured 111 s for a 2.56M-row
  * index build (BENCH_SCALE_r07). This expression is the same exact
  * integer argmin — d(s, c) = |sv - c|^2 accumulated directly, ties to
  * the lowest code — as straight-line Java.
  *
  * A vector shorter than `m * width` zero-pads: the missing dims
  * contribute |c_j|^2 per code, which differs from the HOF's
  * truncated-dot d2 by the constant |x|^2 — same argmin, bit-equal
  * codes (parity spec: PqSpec).
  */
case class PqEncodeCodes(child: Expression, m: Int, width: Int,
                         centroids: Array[Array[Array[Long]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PqEncodeCodes.encode(input.asInstanceOf[ArrayData], m, width, centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCentroids", centroids, "long[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqEncodeCodes.encode($c, $m, $width, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

object PqEncodeCodes {

  /** Static entry shared by interpreted eval and codegen. */
  def encode(ei: ArrayData, m: Int, width: Int,
             cents: Array[Array[Array[Long]]]): ArrayData = {
    val n = ei.numElements()
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cs = cents(s)
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < cs.length) {
        val cv = cs(c)
        var d = 0L
        var j = 0
        while (j < width) {
          val idx = s * width + j
          val x = (if (idx < n) ei.getLong(idx) else 0L) - cv(j)
          d += x * x
          j += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict <: ties -> lowest code
        c += 1
      }
      out(s) = best
      s += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Column API over a pre-quantized long-array column. */
  def codes(ei: Column, m: Int, width: Int,
            centroids: Array[Array[Array[Long]]]): Column =
    ColumnBridge.column(
      PqEncodeCodes(ColumnBridge.expression(ei), m, width, centroids))
}
