package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType, StructField, StructType}

/** Native argmax over a lexicographic (Long, Long) change order with a
  * primitive (Double value, Boolean flag) payload — the CDC latest-wins
  * winner picker, built as a TypedImperativeAggregate so the aggregate
  * stays HASH-based with a fixed 26-byte buffer.
  *
  * The composable form `max_by(struct(value, flag), struct(ord1,
  * ord2))` is semantically identical but structurally expensive at
  * scale: a struct-typed aggregation buffer is not UnsafeRow-mutable,
  * so Catalyst demotes the whole aggregate — partial AND final — to
  * SortAggregate, which sorts every input partition by the grouping
  * key before a single row combines (at the x1000 scale artifact: a
  * 100M-row changelog fully sorted map-side, 711 s summed task time
  * and 24.6 s GC, the GC fed by two fresh struct rows allocated per
  * input row by the max_by update). This operator keeps the winner as
  * five primitive fields in a plain object, so ObjectHashAggregate
  * plans it hash-based: each map task collapses its slice to one
  * buffer per local key with zero per-row allocation, the exchange
  * moves ~|keys| 26-byte payloads, and no sort ever runs.
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
    ord2: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArgMaxPackedAgg.Buf] {

  import ArgMaxPackedAgg.Buf

  override def createAggregationBuffer(): Buf = new Buf

  // Primitive fast paths: an imperative aggregate's update runs
  // interpreted, and Expression.eval BOXES every primitive it returns
  // — at a 100M-row changelog that is ~3 boxed allocations per row and
  // the measured GC driver of the whole shape (x1000: 143 s summed GC
  // with boxing vs the direct reads). After AggregationIterator binds
  // the function, plainly-projected inputs are BoundReferences, which
  // can be read straight off the UnsafeRow with zero allocation; any
  // computed child falls back to eval. Callers therefore pre-project
  // derived ordinals (q173 projects unix_micros(ts) AS a column)
  // rather than passing expressions into the aggregate.
  @transient private[this] lazy val ord1Ref: Int = ord1 match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference => b.ordinal
    case _ => -1
  }
  @transient private[this] lazy val ord2Ref: Int = ord2 match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference => b.ordinal
    case _ => -1
  }
  @transient private[this] lazy val valueRef: Int = value match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference => b.ordinal
    case _ => -1
  }
  @transient private[this] lazy val flagRef: Int = flag match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference => b.ordinal
    case _ => -1
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    var o1 = 0L
    var o2 = 0L
    var ordNull = false
    if (ord1Ref >= 0) {
      if (input.isNullAt(ord1Ref)) ordNull = true
      else o1 = input.getLong(ord1Ref)
    } else {
      val v = ord1.eval(input)
      if (v == null) ordNull = true else o1 = v.asInstanceOf[Long]
    }
    if (!ordNull) {
      if (ord2Ref >= 0) {
        if (input.isNullAt(ord2Ref)) ordNull = true
        else o2 = input.getLong(ord2Ref)
      } else {
        val v = ord2.eval(input)
        if (v == null) ordNull = true else o2 = v.asInstanceOf[Long]
      }
    }
    if (!ordNull &&
        (!buf.set || o1 > buf.o1 || (o1 == buf.o1 && o2 > buf.o2))) {
      buf.set = true
      buf.o1 = o1
      buf.o2 = o2
      if (valueRef >= 0) {
        buf.valueNull = input.isNullAt(valueRef)
        buf.value = if (buf.valueNull) 0.0 else input.getDouble(valueRef)
      } else {
        val v = value.eval(input)
        buf.valueNull = v == null
        buf.value = if (v == null) 0.0 else v.asInstanceOf[Double]
      }
      if (flagRef >= 0) {
        buf.flagNull = input.isNullAt(flagRef)
        buf.flag = !buf.flagNull && input.getBoolean(flagRef)
      } else {
        val f = flag.eval(input)
        buf.flagNull = f == null
        buf.flag = f != null && f.asInstanceOf[Boolean]
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    // Copy into b1 rather than returning b2: the framework owns b1's
    // identity (map entry / mutable row slot); aliasing the input
    // buffer would depend on it never being reused by the caller.
    if (b2.set && (!b1.set || b2.o1 > b1.o1 ||
        (b2.o1 == b1.o1 && b2.o2 > b1.o2))) {
      b1.set = true
      b1.o1 = b2.o1; b1.o2 = b2.o2
      b1.value = b2.value; b1.valueNull = b2.valueNull
      b1.flag = b2.flag; b1.flagNull = b2.flagNull
    }
    b1
  }

  override def eval(buf: Buf): Any =
    if (!buf.set) null
    else new GenericInternalRow(Array[Any](
      if (buf.valueNull) null else buf.value,
      if (buf.flagNull) null else buf.flag))

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(26)
    bb.put(if (buf.set) 1.toByte else 0.toByte)
    bb.putLong(buf.o1)
    bb.putLong(buf.o2)
    bb.putDouble(buf.value)
    bb.put(((if (buf.valueNull) 1 else 0) |
      (if (buf.flagNull) 2 else 0) |
      (if (buf.flag) 4 else 0)).toByte)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buf
    buf.set = bb.get() == 1
    buf.o1 = bb.getLong
    buf.o2 = bb.getLong
    buf.value = bb.getDouble
    val bits = bb.get()
    buf.valueNull = (bits & 1) != 0
    buf.flagNull = (bits & 2) != 0
    buf.flag = (bits & 4) != 0
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("value", DoubleType, nullable = true),
    StructField("flag", BooleanType, nullable = true)))
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(value, flag, ord1, ord2)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (value.dataType, flag.dataType, ord1.dataType, ord2.dataType) match {
      case (DoubleType, BooleanType, LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (v, f, o1, o2) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "arg_max_packed requires (double, boolean, bigint, bigint), " +
            s"got (${v.catalogString}, ${f.catalogString}, " +
            s"${o1.catalogString}, ${o2.catalogString})")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgMaxPackedAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgMaxPackedAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgMaxPackedAgg =
    copy(value = newChildren(0), flag = newChildren(1),
      ord1 = newChildren(2), ord2 = newChildren(3))
}

object ArgMaxPackedAgg {
  /** Mutable winner state: five primitives, no boxing. */
  final class Buf {
    var set: Boolean = false
    var o1: Long = Long.MinValue
    var o2: Long = Long.MinValue
    var value: Double = 0.0
    var valueNull: Boolean = false
    var flag: Boolean = false
    var flagNull: Boolean = false
  }

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
