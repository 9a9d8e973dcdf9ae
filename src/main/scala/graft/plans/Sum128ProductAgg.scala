package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, And, AttributeReference, BinaryExpression, BitwiseAnd, BitwiseNot, BitwiseOr, EqualTo, EvalMode, Expression, GreaterThanOrEqual, If, IsNotNull, Literal, Multiply, Not, Or, ShiftRightUnsigned, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, Decimal, DecimalType, LongType}

/** `Math.multiplyHigh` as a codegen'd scalar: the upper 64 bits of the
  * signed 128-bit product of two BIGINTs. Paired with the plain
  * (wrapping) `Multiply` for the low word inside [[Sum128ProductAgg]];
  * not registered as a SQL function — it only exists so the 128-bit
  * accumulator can stay a DeclarativeAggregate over primitive fields. */
case class MultiplyHighLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"multiply_high requires (bigint, bigint), got " +
          s"(${a.catalogString}, ${b.catalogString})")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Math.multiplyHigh(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Math.multiplyHigh($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultiplyHighLong =
    copy(left = newLeft, right = newRight)
}

/** Per-group finisher for [[Sum128ProductAgg]]: (hi, lo) two's-complement
  * 128-bit value -> DECIMAL(38,0), raising on the overflow flag or a
  * magnitude past 38 digits. BigInteger appears HERE ONLY — once per
  * group in the result projection, never per input row. */
object Int128 {
  def toDecimal(hi: Long, lo: Long, overflowed: Boolean): Decimal = {
    if (overflowed)
      throw new ArithmeticException(
        "sum128_product: exact 128-bit accumulator overflow (|sum| >= 2^127)")
    val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    val d = Decimal(new java.math.BigDecimal(bi))
    if (!d.changePrecision(38, 0))
      throw new ArithmeticException(
        "sum128_product: exact sum exceeds DECIMAL(38,0) (|sum| >= 10^38)")
    d
  }
}

case class Int128ToDecimal(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = DecimalType(38, 0)
  override protected def nullSafeEval(hi: Any, lo: Any, ovf: Any): Any =
    Int128.toDecimal(hi.asInstanceOf[Long], lo.asInstanceOf[Long],
      ovf.asInstanceOf[Boolean])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hi, lo, ovf) =>
      s"${ev.value} = graft.plans.Int128.toDecimal($hi, $lo, $ovf);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Int128ToDecimal = copy(first = f, second = s, third = t)
}

/** Exact `SUM(a * b)` over BIGINT pairs on a native two-long 128-bit
  * accumulator — the weighted-sum primitive (q152's `sum(vu * dt_us)`)
  * whose products genuinely exceed 2^63, built so the aggregation
  * buffer stays ALL-PRIMITIVE.
  *
  * Why not `sum(CAST(a AS DECIMAL(26,0)) * b)` (the r13 form): the
  * product promotes to a precision-38 decimal and the sum rides a
  * precision-38 buffer, which UnsafeRow stores as bytes — every one of
  * the N per-row buffer updates allocates BigDecimals (the same
  * non-compact regime the hourlyAgg Long-buffer fix removed; here the
  * product can exceed 2^63 so a single Long cannot replace it). At the
  * x1000 deep point that churn made time_weighted the slowest
  * non-deliberate event shape. Two plain longs ARE enough: the low
  * word is the wrapping product `a * b` (Java semantics), the high
  * word is `Math.multiplyHigh(a, b)`, and 128-bit addition is one
  * wrapping add plus a bitwise carry — update/merge stay inside
  * whole-stage codegen as branch-free long arithmetic on an
  * UnsafeRow-inline buffer, exactly like [[ArgMaxPackedAgg]].
  *
  * Exactness domain: |true sum| < 2^127 (~1.7e38) — strictly WIDER
  * than the decimal form's 10^38, and overflow RAISES instead of
  * silently nulling: signed 128-bit addition overflow (same-sign
  * operands, opposite-sign result, read off the hi words) latches a
  * boolean buffer field checked in eval, and a sum in (10^38, 2^127)
  * fails the DECIMAL(38,0) conversion. Null semantics match
  * `sum(a * b)`: rows with a null on either side are skipped; a group
  * with no valid pair evaluates to NULL. Output DECIMAL(38,0), so
  * downstream `div`/cast arithmetic is unchanged from the decimal
  * form (Sum128Spec pins value equality on adversarial magnitudes). */
case class Sum128ProductAgg(left: Expression, right: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, 0)

  private lazy val bufHi =
    AttributeReference("s128_hi", LongType, nullable = false)()
  private lazy val bufLo =
    AttributeReference("s128_lo", LongType, nullable = false)()
  private lazy val bufN =
    AttributeReference("s128_n", LongType, nullable = false)()
  private lazy val bufOvf =
    AttributeReference("s128_ovf", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bufHi, bufLo, bufN, bufOvf)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(0L), Literal(0L), Literal(0L), Literal(false))

  /** Wrapping long add — 128-bit limbs need Java two's-complement
    * semantics regardless of the session's ANSI setting. */
  private def wadd(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** Carry out of the unsigned low-word add `lo1 + lo2 = sum`:
    * ((lo1 & lo2) | ((lo1 | lo2) & ~sum)) >>> 63. */
  private def carry(lo1: Expression, lo2: Expression,
      sum: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(lo1, lo2),
        BitwiseAnd(BitwiseOr(lo1, lo2), BitwiseNot(sum))),
      Literal(63))

  private def nonNeg(e: Expression): Expression =
    GreaterThanOrEqual(e, Literal(0L))

  /** Signed 128-bit addition overflow, read off the hi words: operands
    * same sign AND result sign differs. */
  private def addOverflows(hi1: Expression, hi2: Expression,
      hiSum: Expression): Expression =
    And(EqualTo(nonNeg(hi1), nonNeg(hi2)),
      Not(EqualTo(nonNeg(hiSum), nonNeg(hi1))))

  /** (newHi, newLo, newOvf) of buffer + (hi2, lo2); the three results
    * share sLo/sHi via codegen subexpression elimination. */
  private def add128(hi1: Expression, lo1: Expression, ovf1: Expression,
      hi2: Expression, lo2: Expression): (Expression, Expression, Expression) = {
    val sLo = wadd(lo1, lo2)
    val sHi = wadd(wadd(hi1, hi2), carry(lo1, lo2, sLo))
    (sHi, sLo, Or(ovf1, addOverflows(hi1, hi2, sHi)))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val valid = And(IsNotNull(left), IsNotNull(right))
    val pLo = Multiply(left, right, EvalMode.LEGACY)
    val pHi = MultiplyHighLong(left, right)
    val (nHi, nLo, nOvf) = add128(bufHi, bufLo, bufOvf, pHi, pLo)
    Seq(
      If(valid, nHi, bufHi),
      If(valid, nLo, bufLo),
      If(valid, wadd(bufN, Literal(1L)), bufN),
      If(valid, nOvf, bufOvf))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (nHi, nLo, nOvf) =
      add128(bufHi.left, bufLo.left, bufOvf.left, bufHi.right, bufLo.right)
    Seq(nHi, nLo, wadd(bufN.left, bufN.right), Or(nOvf, bufOvf.right))
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(bufN, Literal(0L)),
      Literal.create(null, dataType),
      Int128ToDecimal(bufHi, bufLo, bufOvf))

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"sum128_product requires (bigint, bigint), got " +
          s"(${a.catalogString}, ${b.catalogString})")
    }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Sum128ProductAgg =
    copy(left = newChildren(0), right = newChildren(1))
}

object Sum128ProductAgg {
  /** Column API: exact `SUM(a * b)` as DECIMAL(38,0); both columns must
    * be BIGINT. Raises on |sum| >= 2^127 instead of nulling. */
  def sum128Product(a: Column, b: Column): Column =
    GraftColumnBridge.column(Sum128ProductAgg(
      GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)).toAggregateExpression())
}
