package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Scalar extraction over serialized sketches, as native expressions
  * so the SQL surface ([[GraftFunctions]]) matches the Column API:
  * `kll_quantile(sketch, rank)` and `theta_estimate(sketch)`. These
  * run on POST-aggregation rows (one sketch per group — KB-scale
  * counts, never a per-row hot path), but they still codegen like the
  * rest of the expression library so a whole-stage span never breaks
  * on them.
  */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantile requires (BINARY sketch, DOUBLE rank); got" +
        s" (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"

  override def nullSafeEval(sketch: Any, rank: Any): Any =
    Kll.quantile(sketch.asInstanceOf[Array[Byte]],
      rank.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sk, r) => s"graft.functions.Kll.quantile($sk, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

case class ThetaEstimate(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_estimate requires a BINARY sketch (got ${child.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  override def nullSafeEval(sketch: Any): Any =
    Theta.estimate(sketch.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, sk => s"graft.functions.Theta.estimate($sk)")

  override protected def withNewChildInternal(
      newChild: Expression): ThetaEstimate = copy(child = newChild)
}
