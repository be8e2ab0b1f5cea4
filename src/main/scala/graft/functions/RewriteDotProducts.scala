package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the composable dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> [cast](x) * [cast](y)),
  *               0.0D, (acc, v) -> acc + v) }}}
  *
  * into the native, codegen'd [[DotProduct]] expression. Higher-order
  * function lambdas evaluate interpreted (every element invocation
  * walks an expression tree and pins a NamedLambdaVariable), so users
  * who write the declarative form pay ~10–30× on scan-heavy vector
  * scoring; after this rule they get the fused loop automatically —
  * the same contract Catalyst built-ins enjoy: write what you mean,
  * the optimizer picks the physical form.
  *
  * The match is deliberately strict — exact 0.0D zero, pure `acc + v`
  * merge, identity finish, element-wise multiply with at most a
  * float→double widening cast — because the rewrite must be
  * bit-identical: same left-to-right fold, same widen-before-multiply,
  * same null semantics (null element or length mismatch → NULL; see
  * DotProduct's scaladoc).
  *
  * Installed per-session via `spark.experimental.extraOptimizations`
  * (see [[VectorFunctions.register]]) or for all sessions via
  * `GraftExtensions`.
  */
object RewriteDotProducts extends Rule[LogicalPlan] {

  /** The lambda's element reference, allowing the float→double
    * widening cast that DotProduct performs internally.
    */
  private def stripWiden(e: Expression): Option[NamedLambdaVariable] = e match {
    case v: NamedLambdaVariable => Some(v)
    case Cast(v: NamedLambdaVariable, DoubleType, _, _) if v.dataType == FloatType => Some(v)
    case _ => None
  }

  /** x*y or y*x (dot is symmetric, multiply commutative). */
  private def elemsMatch(mx: Expression, my: Expression,
                         x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean = {
    val sx = stripWiden(mx).map(_.exprId)
    val sy = stripWiden(my).map(_.exprId)
    (sx.contains(x.exprId) && sy.contains(y.exprId)) ||
      (sx.contains(y.exprId) && sy.contains(x.exprId))
  }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _                        => false
  }

  private def numericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _                                                  => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(mx, my, _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          zero,
          LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
            Seq(accArg: NamedLambdaVariable, vArg: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(finArg: NamedLambdaVariable), _))
        if isZero(zero)
          && acc.exprId == accArg.exprId && v.exprId == vArg.exprId
          && fin.exprId == finArg.exprId
          && numericArray(a) && numericArray(b) && a.dataType == b.dataType
          && elemsMatch(mx, my, x, y) =>
      DotProduct(a, b)
  }
}
