package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: |a ∩ b| for two SORTED, DISTINCT,
  * non-null long-array columns, by two-pointer merge.
  *
  * The composable form `size(array_intersect(a, b))` builds a hash set
  * of one side and materializes the intersection ARRAY — per-row heap
  * allocation that the caller immediately reduces to its length. On
  * the triangle-closure probe (one intersection per oriented edge,
  * arrays up to ~sqrt(m) entries) that garbage dominated GC at 10x
  * scale (39 s summed GC). This expression walks both ArrayDatas with
  * two cursors — zero allocation, no virtual calls — and stays inside
  * whole-stage codegen.
  *
  * Preconditions (the adjacency-build in Graph.trianglesProfile
  * guarantees both): elements sorted ascending and distinct within
  * each array. On unsorted input the count is undefined — this is a
  * plan-internal primitive, not a general API.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  // ArrayData.getLong misreads any non-bigint element encoding, so a
  // mistyped caller (array<int>) must fail at ANALYSIS, not return
  // silently-garbage counts.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          "sorted_long_intersect_count requires array<bigint> on both " +
            s"sides, got ${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectCount {
  /** Column-level API; both columns must be array<bigint>. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedLongIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
