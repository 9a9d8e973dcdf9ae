package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, CreateNamedStruct, EqualTo, Expression, GreaterThan, If, IsNotNull, IsNull, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType, StructField, StructType}

/** Native argmax over a lexicographic (Long, Long) change order with a
  * primitive (Double value, Boolean flag) payload — the CDC latest-wins
  * winner picker, built as a DeclarativeAggregate over an all-primitive
  * four-field buffer so the aggregate plans as plain codegen'd
  * HashAggregateExec at EVERY key cardinality.
  *
  * Why not the composable `max_by(struct(value, flag), struct(ord1,
  * ord2))`: a struct-typed aggregation buffer is not UnsafeRow-mutable,
  * so Catalyst demotes the whole aggregate — partial AND final — to
  * SortAggregate, which sorts every input partition by the grouping key
  * before a single row combines (x1000 artifact: a 100M-row changelog
  * fully sorted map-side, 711 s summed task time, 24.6 s GC from two
  * fresh struct rows per input row).
  *
  * Why not a TypedImperativeAggregate (the r11 form): that keeps the
  * plan hash-based only while ObjectHashAggregate's in-memory group
  * count stays under `spark.sql.objectHashAggregate.sortBased.
  * fallbackThreshold`. The x1000 changelog layout (per-partition
  * distinct keys ≈ rows, ~1.3M groups per map task) blows past any
  * sane threshold, the exec falls back to sort-based object
  * aggregation, and the map-side sort+spill the native aggregate
  * existed to avoid comes back (r11 artifact: 9.8 GB memory / 3.6 GB
  * disk spill, 8.1 s GC). A declarative aggregate with LongType /
  * DoubleType / BooleanType buffer fields qualifies for
  * HashAggregateExec instead: the winner state lives inline in the
  * UnsafeRow-backed Tungsten aggregation map (no per-group JVM object,
  * no serialize/deserialize at the exchange), update/merge are
  * whole-stage-codegen'd branch-free-ish comparisons, and when a map
  * task genuinely holds more groups than memory the exec spills
  * UnsafeRow runs through the managed sorter — bounded, off-heap,
  * GC-free — rather than churning a millions-entry object map.
  *
  * Ordering: (ord1, ord2) lexicographic, larger wins; rows with a NULL
  * ord1 or ord2 are ignored (arg_max null semantics — both engines drop
  * null-ordered rows). The payload value may be null; the flag is
  * stored as written. Deterministic whenever (ord1, ord2) is unique per
  * group (the CDC contract: tie = a unique event id).
  */
case class ArgMaxPackedAgg(
    value: Expression,
    flag: Expression,
    ord1: Expression,
    ord2: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(value, flag, ord1, ord2)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("value", DoubleType, nullable = true),
    StructField("flag", BooleanType, nullable = true)))

  // Buffer: the current winner's (ord1, ord2, value, flag). o1 doubles
  // as the "unset" sentinel (NULL until the first non-null-ordered row
  // lands); o2 is never read before o1 is set, so it can stay
  // non-nullable primitive.
  private lazy val bufO1 =
    AttributeReference("argmax_o1", LongType, nullable = true)()
  private lazy val bufO2 =
    AttributeReference("argmax_o2", LongType, nullable = false)()
  private lazy val bufV =
    AttributeReference("argmax_value", DoubleType, nullable = true)()
  private lazy val bufF =
    AttributeReference("argmax_flag", BooleanType, nullable = true)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bufO1, bufO2, bufV, bufF)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, LongType),
    Literal(Long.MinValue),
    Literal.create(null, DoubleType),
    Literal.create(null, BooleanType))

  /** Candidate (o1, o2) beats the current (curO1, curO2) winner:
    * candidate fully non-null AND (buffer unset OR lexicographically
    * greater). Codegen evaluates this once per buffer-field If via
    * subexpression elimination. */
  private def beats(o1: Expression, o2: Expression,
      curO1: Expression, curO2: Expression): Expression =
    And(And(IsNotNull(o1), IsNotNull(o2)),
      Or(IsNull(curO1),
        Or(GreaterThan(o1, curO1),
          And(EqualTo(o1, curO1), GreaterThan(o2, curO2)))))

  override lazy val updateExpressions: Seq[Expression] = {
    val b = beats(ord1, ord2, bufO1, bufO2)
    Seq(If(b, ord1, bufO1), If(b, ord2, bufO2),
      If(b, value, bufV), If(b, flag, bufF))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val b = beats(bufO1.right, bufO2.right, bufO1.left, bufO2.left)
    Seq(If(b, bufO1.right, bufO1.left), If(b, bufO2.right, bufO2.left),
      If(b, bufV.right, bufV.left), If(b, bufF.right, bufF.left))
  }

  override lazy val evaluateExpression: Expression =
    If(IsNull(bufO1), Literal.create(null, dataType),
      CreateNamedStruct(Seq(
        Literal("value"), bufV, Literal("flag"), bufF)))

  override def checkInputDataTypes(): TypeCheckResult =
    (value.dataType, flag.dataType, ord1.dataType, ord2.dataType) match {
      case (DoubleType, BooleanType, LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (v, f, o1, o2) =>
        TypeCheckResult.TypeCheckFailure(
          "arg_max_packed requires (double, boolean, bigint, bigint), " +
            s"got (${v.catalogString}, ${f.catalogString}, " +
            s"${o1.catalogString}, ${o2.catalogString})")
    }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgMaxPackedAgg =
    copy(value = newChildren(0), flag = newChildren(1),
      ord1 = newChildren(2), ord2 = newChildren(3))
}

object ArgMaxPackedAgg {
  /** Column API: latest (value, flag) by lexicographic (ord1, ord2);
    * ord columns must be BIGINT (cast timestamps via unix_micros). */
  def argMaxPacked(value: Column, flag: Column,
      ord1: Column, ord2: Column): Column =
    GraftColumnBridge.column(ArgMaxPackedAgg(
      GraftColumnBridge.expression(value),
      GraftColumnBridge.expression(flag),
      GraftColumnBridge.expression(ord1),
      GraftColumnBridge.expression(ord2)).toAggregateExpression())
}
