package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two float-array columns.
  *
  * The composable form (`zip_with` + `aggregate`) allocates an
  * intermediate array and evaluates two lambda closures per element;
  * this expression codegens a single fused loop over the underlying
  * ArrayData — no allocation, no virtual calls — and stays inside
  * whole-stage codegen. Summation is the same strict left fold in
  * element order as the composable form (and as DuckDB's
  * list_dot_product), so results are bit-identical. Mismatched lengths
  * yield NULL, exactly like the composable form (zip_with pads the
  * shorter side with nulls, which nulls the fold) — an upstream
  * dimension bug surfaces as a visible null, never as a plausible
  * truncated partial sum.
  *
  * Array elements are assumed non-null (dense embedding vectors).
  */
case class FloatVecDot(left: Expression, right: Expression)
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
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {
  /** Column-level API. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatVecDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
