package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 16-bit Morton (Z-order) interleave of two
  * integer columns.
  *
  * `zorder16(x, y)` interleaves the low 16 bits of `x` (even bit
  * positions) and `y` (odd bit positions) into a 32-bit Z-value. Sorting
  * or range-partitioning a table by this value clusters rows that are
  * close in BOTH dimensions into the same parquet row groups, so
  * min/max row-group statistics prune two-dimensional range predicates —
  * the multi-dimensional data-skipping layout (the technique behind
  * Z-order OPTIMIZE in lakehouse table formats) reduced to one scalar
  * expression. At write time: `df.sortWithinPartitions(zorder16(a, b))`
  * (or repartitionByRange on it) before the parquet sink.
  *
  * The bit spread is the classic magic-mask doubling sequence — four
  * shift-mask steps per operand, branch-free, fully inside whole-stage
  * codegen. Pure bit arithmetic: engine-exact everywhere.
  */
case class ZOrder16(left: Expression, right: Expression)
    extends BinaryExpression {

  // children must be LongType — the Column/SQL builders insert casts
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val z = ZOrder16.spread(a.asInstanceOf[Long]) |
      (ZOrder16.spread(b.asInstanceOf[Long]) << 1)
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      def spreadCode(in: String, v: String): String =
        s"""
           |long $v = $in & 0xFFFFL;
           |$v = ($v | ($v << 8)) & 0x00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x33333333L;
           |$v = ($v | ($v << 1)) & 0x55555555L;
         """.stripMargin
      s"""
         |${spreadCode(a, sx)}
         |${spreadCode(b, sy)}
         |${ev.value} = $sx | ($sy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder16 =
    copy(left = newLeft, right = newRight)
}

object ZOrder16 {

  /** Spread the low 16 bits of v to the even bit positions of a 32-bit
    * lane (interleave-ready). */
  def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** Column-level API; casts both operands to long. */
  def zorder16(x: Column, y: Column): Column =
    GraftColumnBridge.column(ZOrder16(
      GraftColumnBridge.expression(x.cast("long")),
      GraftColumnBridge.expression(y.cast("long"))))
}
