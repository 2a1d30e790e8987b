package graft.plans

import graft.functions.LongDotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the idiomatic HOF integer dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * into the native codegen'd [[LongDotProduct]] loop. Higher-order
  * functions evaluate their lambda per element through the
  * interpreter, so users writing the natural SQL formulation pay
  * interpretation cost on every array element of every row; the
  * rewrite gives them the native loop without changing their query.
  *
  * Semantics-preserving by construction: integer addition is exactly
  * associative (same value under any evaluation order), the rewrite
  * fires only on array<bigint> with provably non-null elements, and
  * LongDotProduct mirrors zip_with's length-mismatch behavior
  * (null result). Registered via SparkSessionExtensions in
  * GraftSession.
  */
object NativeDotRewrite extends Rule[LogicalPlan] {

  private def longArrayNoNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(_: NamedLambdaVariable,
              _: NamedLambdaVariable, _), _, _)),
            Literal(0L, LongType),
            LambdaFunction(Add(_: NamedLambdaVariable,
              _: NamedLambdaVariable, _), _, _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(finArg), _))
          if fin.exprId == finArg.asInstanceOf[NamedLambdaVariable].exprId &&
            longArrayNoNulls(a) && longArrayNoNulls(b) =>
        LongDotProduct(a, b)
    }
}
