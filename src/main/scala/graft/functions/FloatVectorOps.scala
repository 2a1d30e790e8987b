package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native codegen'd dot product over two array<float> columns.
  *
  * The composable alternative — `aggregate(zip_with(a, b, ...))` —
  * builds an intermediate array and evaluates a lambda per element
  * (higher-order functions are interpreted, not codegen'd). For a
  * 64-dim embedding scanned billions of times, that's allocation +
  * virtual dispatch per element. This expression compiles to a tight
  * primitive loop over the two ArrayData buffers inside whole-stage
  * codegen — the difference between a vector scan that keeps up with
  * the parquet reader and one that doesn't.
  *
  * Used by the performance path of Similarity; the oracle-parity path
  * keeps integer-quantized HOF math (exactness contract there).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val n = math.min(arrA.numElements(), arrB.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += arrA.getFloat(i).toDouble * arrB.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd dot product over two array<long> columns.
  *
  * Unlike float dots, INTEGER dot products are exactly associative —
  * the result is bit-identical to the interpreted
  * `aggregate(zip_with(...))` chain under any evaluation order. So
  * this expression can sit on the ORACLE-parity path (Similarity
  * .dotLong): same exactness contract, codegen loop instead of a
  * per-element lambda interpreter.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  // null on length mismatch — zip_with pads the shorter array with
  // nulls and the sum collapses to null, and this expression must be
  // substitutable for that chain (plans/NativeDotRewrite relies on it)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val n = arrA.numElements()
    if (n != arrB.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += arrA.getLong(i) * arrB.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

object FloatVectorOps {

  /** Column API: dot(a, b) over array<float>. */
  def floatDot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API: exact dot(a, b) over array<long>. */
  def longDot(a: Column, b: Column): Column =
    ColumnBridge.column(LongDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Cosine similarity built on the native dot. */
  def floatCosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    floatDot(a, b) / (sqrt(floatDot(a, a)) * sqrt(floatDot(b, b)))
  }
}
