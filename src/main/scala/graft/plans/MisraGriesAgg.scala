package graft.plans

import java.nio.charset.StandardCharsets
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a native
  * TypedImperativeAggregate: at most `k` counters per buffer, with the
  * guarantee that ANY value whose true frequency exceeds n/(k+1) is
  * present in the final summary. Buffers merge by counter addition
  * followed by the (k+1)-th-largest-count subtraction — the standard
  * mergeable-summaries construction — so the sketch is shuffle-safe:
  * partial aggregates combine map-side and the guarantee survives any
  * partitioning.
  *
  * The sketch output (candidate set) can depend on encounter order for
  * values NEAR the threshold; the heavy-hitter operator therefore
  * treats it strictly as a candidate GENERATOR and re-counts candidates
  * exactly in a verification pass (semi-join on the candidate set, so
  * only candidate rows shuffle) — the final result is exact and
  * deterministic while the full-vocabulary aggregation is never built.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  private def decrementAll(buf: java.util.HashMap[String, Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      val cur: Long = buf.getOrDefault(s, 0L)
      if (cur > 0L) buf.put(s, cur + 1L)
      else if (buf.size < k) buf.put(s, 1L)
      else decrementAll(buf, 1L)
    }
    buf
  }

  override def merge(
      b1: java.util.HashMap[String, Long],
      b2: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur: Long = b1.getOrDefault(e.getKey, 0L)
      b1.put(e.getKey, cur + e.getValue)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from every counter — the
      // merge-side analog of the decrement step; at most k survive.
      val counts = new Array[Long](b1.size)
      var i = 0
      val vit = b1.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val kth = counts(b1.size - k - 1)
      decrementAll(b1, kth)
    }
    b1
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val keys = new Array[String](buf.size)
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(UTF8String.fromString))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var total = 4
    val entries = new java.util.ArrayList[(Array[Byte], Long)](buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries.add((b, e.getValue))
      total += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(entries.size)
    var i = 0
    while (i < entries.size) {
      val (b, c) = entries.get(i)
      bb.putInt(b.length)
      bb.put(b)
      bb.putLong(c)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Column-level API: Misra-Gries candidate set (sorted array of at
    * most k strings) for a string column. */
  def misraGries(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      MisraGriesAgg(GraftColumnBridge.expression(c), k).toAggregateExpression())
}
