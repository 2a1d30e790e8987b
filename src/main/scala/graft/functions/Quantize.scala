package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native micro-quantization: `array<float|double> -> array<long>` at
  * 1e-6 resolution, bit-equal to the HOF chain
  * `transform(emb, x -> round(x.cast(double) * 1e6).cast(long))`
  * ([[graft.ops.Similarity.quantizeHof]]).
  *
  * The HOF chain is CodegenFallback — 64 interpreted lambda
  * evaluations per row — and it sits at the MOUTH of every quantized
  * vector op (`Similarity.withQuantized`): brute force, LSH, IVF
  * assignment, PQ encode, SemDeDup, and every probe's base-table
  * re-rank scan pay it per row scanned. One compiled loop instead.
  *
  * Rounding parity: Spark's `round` on DoubleType is
  * `BigDecimal(v).setScale(0, HALF_UP)` (decimal-string semantics, so
  * -1.5 -> -2 where `Math.round` gives -1), then the long cast
  * truncates the rounded double. Replicated here via the same
  * BigDecimal path; pinned by the PqSpec parity row and by every
  * quantized query's hash-exact oracle.
  */
case class QuantizeMicro(child: Expression) extends UnaryExpression {

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(LongType,
    child.dataType.asInstanceOf[ArrayType].containsNull)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_micro needs array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    QuantizeMicro.quant(input.asInstanceOf[ArrayData], elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.QuantizeMicro.quant($c, $elemIsFloat)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeMicro =
    copy(child = newChild)
}

object QuantizeMicro {

  private def quantOne(v: Double): Long = {
    val p = v * 1000000.0
    // non-finite/overflowing values are OUT of contract (under ANSI
    // the HOF's long cast throws on them, so they never reached a
    // quantized column); degrade to JVM truncation instead of
    // throwing — BigDecimal.valueOf would throw on NaN
    if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)) p.toLong
    else java.math.BigDecimal.valueOf(p)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
  }

  /** Static entry shared by interpreted eval and codegen. Null
    * elements pass through as nulls (transform semantics). The
    * null-free case — every fixture embedding — fills a primitive
    * long[] (unboxed UnsafeArrayData-backed result); this runs once
    * per row SCANNED across every quantized op, so per-element boxing
    * here would be ~10^8-10^10 avoidable allocations at bench scale.
    */
  def quant(arr: ArrayData, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    val prim = new Array[Long](n)
    var i = 0
    while (i < n && !arr.isNullAt(i)) {
      prim(i) = quantOne(
        if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      i += 1
    }
    if (i == n) return ArrayData.toArrayData(prim)
    // first null seen at i: fall back to the boxed representation,
    // keeping the prefix already computed
    val out = new Array[Any](n)
    var j = 0
    while (j < i) { out(j) = prim(j); j += 1 }
    while (j < n) {
      if (!arr.isNullAt(j))
        out(j) = quantOne(
          if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: quantize an embedding column to micro-unit longs. */
  def quantize(emb: Column): Column =
    ColumnBridge.column(QuantizeMicro(ColumnBridge.expression(emb)))
}
