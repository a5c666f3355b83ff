package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the composed dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the fused [[DotProduct]] expression whenever `a`/`b` are
  * ARRAY<DOUBLE>. Users writing the idiomatic higher-order-function form
  * get the zero-allocation codegen'd kernel automatically — the
  * `Rule[LogicalPlan]` + SparkSessionExtensions path SURVEY §4 reserves
  * for cases where plan rewriting genuinely pays (here: a per-row
  * intermediate array on an N² join hot path).
  *
  * The match is deliberately conservative: exact multiply/add lambda
  * shapes, double-typed zero, identity (or absent) finish lambda.
  * [[DotProduct]] mirrors the composed form's NULL semantics (length
  * mismatch or a null element → NULL), so the rewrite is
  * semantics-preserving for every input, not just equal-length
  * non-null-element arrays — FusionSpec pins both edge cases.
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object MultiplyLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable,
          y: NamedLambdaVariable, _), Seq(a, b), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object AddLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Add(x: NamedLambdaVariable,
          y: NamedLambdaVariable, _), Seq(a, b), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object IdentityFinish {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(v: NamedLambdaVariable,
          Seq(a: NamedLambdaVariable), _) => v.exprId == a.exprId
      case _ => false
    }
  }

  private def zeroLiteral(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(0.0, DoubleType), DoubleType, _, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, MultiplyLambda()), zero, AddLambda(), finish)
          if zeroLiteral(zero) && isDoubleArray(a) && isDoubleArray(b) &&
            (finish match {
              case IdentityFinish() => true
              case _ => false
            }) =>
        DotProduct(a, b)
    }
}
