package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the composable dot-product pattern
  *
  *   aggregate(zip_with(transform(a, x -> cast(x as double)),
  *                      transform(b, x -> cast(x as double)),
  *                      (x, y) -> x * y),
  *             0.0, (acc, x) -> acc + x)
  *
  * over float arrays into the fused native [[FloatVecDot]] — so code
  * written with plain built-ins gets the single-loop codegen'd form
  * automatically. Semantics are identical (same strict left fold), so
  * the rewrite is always safe when the pattern matches exactly.
  */
object FuseFloatVecDot extends Rule[LogicalPlan] {

  /** transform(arr, x -> cast(x as double)) over array<float> -> arr */
  private def castedFloatArray(e: Expression): Option[Expression] = e match {
    case ArrayTransform(arr,
        LambdaFunction(c: Cast, Seq(v2: NamedLambdaVariable), _))
      if c.child.isInstanceOf[NamedLambdaVariable] &&
        c.child.asInstanceOf[NamedLambdaVariable].exprId == v2.exprId &&
        c.dataType == DoubleType &&
        (arr.dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        }) => Some(arr)
    case _ => None
  }

  private def sameVar(a: Expression, b: NamedLambdaVariable): Boolean =
    a.isInstanceOf[NamedLambdaVariable] &&
      a.asInstanceOf[NamedLambdaVariable].exprId == b.exprId

  private def fuse(agg: ArrayAggregate): Option[FloatVecDot] = agg match {
    case ArrayAggregate(
        ZipWith(ta, tb,
          LambdaFunction(Multiply(mx, my, _),
            Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(ax, ay, _),
          Seq(bx: NamedLambdaVariable, by: NamedLambdaVariable), _),
        LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
      if sameVar(mx, lx) && sameVar(my, ly) &&
        sameVar(ax, bx) && sameVar(ay, by) && sameVar(fin, fv) =>
      for {
        a <- castedFloatArray(ta)
        b <- castedFloatArray(tb)
      } yield FloatVecDot(a, b)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg: ArrayAggregate if fuse(agg).isDefined => fuse(agg).get
    }
}
