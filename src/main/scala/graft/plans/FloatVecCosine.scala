package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native cosine similarity over two float-array columns: ONE fused loop
  * accumulates dot(a,b), dot(a,a) and dot(b,b) together — the composable
  * form traverses each array three times (dot + two norms). Null when
  * either norm is zero (mirrors the composable `when(na > 0 && nb > 0)`
  * guard) and when the lengths differ (mirrors zip_with's null padding
  * nulling the dot — a dimension bug must surface as a null, not as a
  * truncated partial). Accumulation order per sum matches the strict
  * left fold, so results are bit-identical to dot/(sqrt*sqrt) computed
  * separately.
  */
case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  private def compute(x: ArrayData, y: ArrayData): Any = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sab = 0.0
    var saa = 0.0
    var sbb = 0.0
    var i = 0
    while (i < n) {
      val a = x.getFloat(i).toDouble
      val b = y.getFloat(i).toDouble
      sab += a * b
      saa += a * a
      sbb += b * b
      i += 1
    }
    val na = math.sqrt(saa)
    val nb = math.sqrt(sbb)
    if (na > 0 && nb > 0) sab / (na * nb) else null
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sab = ctx.freshName("sab")
      val saa = ctx.freshName("saa")
      val sbb = ctx.freshName("sbb")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sab = 0.0; double $saa = 0.0; double $sbb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $va = (double) $a.getFloat($i);
         |    double $vb = (double) $b.getFloat($i);
         |    $sab += $va * $vb; $saa += $va * $va; $sbb += $vb * $vb;
         |  }
         |  double $na = java.lang.Math.sqrt($saa);
         |  double $nb = java.lang.Math.sqrt($sbb);
         |  if ($na > 0 && $nb > 0) { ${ev.value} = $sab / ($na * $nb); }
         |  else { ${ev.isNull} = true; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecCosine =
    copy(left = newLeft, right = newRight)
}

object FloatVecCosine {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatVecCosine(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
