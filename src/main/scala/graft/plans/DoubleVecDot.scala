package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two double-array columns
  * — the array<double> sibling of [[FloatVecDot]] (see there for the
  * full rationale). The composable `aggregate(zip_with(...))` form
  * allocates an intermediate array per evaluation, which on a pairwise
  * stage (k-means E-step: rows x centroids x 3 dots) is the dominant
  * GC source at scale; this is one fused codegen'd loop over the
  * ArrayData, zero allocation. Summation is the same strict left fold
  * in element order as the composable form (and as DuckDB's
  * list_dot_product over double lists), so results are bit-identical.
  * Mismatched lengths yield NULL, exactly like the composable form
  * (zip_with pads the shorter side with nulls, which nulls the fold) —
  * an upstream dimension bug surfaces as a visible null, never as a
  * plausible truncated partial sum.
  *
  * Array elements are assumed non-null (dense vectors).
  */
case class DoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleVecDot =
    copy(left = newLeft, right = newRight)
}

object DoubleVecDot {
  /** Column-level API. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(DoubleVecDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
