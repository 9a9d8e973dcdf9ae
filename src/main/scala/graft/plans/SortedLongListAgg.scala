package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Growable primitive long buffer: the whole point of this aggregate.
  * `sort_array(collect_list(x))` keeps an ArrayBuffer[Any] of BOXED
  * longs per group — on the triangle counter's adjacency build that is
  * one box per oriented edge (90M at the x100 scale point), and that
  * allocation churn measured 15-35 s of GC per run. This buffer holds
  * raw longs, doubles on demand, and never boxes. */
final class LongVec(var arr: Array[Long], var n: Int) {
  def this() = this(new Array[Long](8), 0)
  def add(v: Long): Unit = {
    if (n == arr.length) {
      val bigger = new Array[Long](arr.length << 1)
      System.arraycopy(arr, 0, bigger, 0, n)
      arr = bigger
    }
    arr(n) = v
    n += 1
  }
  def addAll(o: LongVec): Unit = {
    if (n + o.n > arr.length) {
      var cap = arr.length
      while (cap < n + o.n) cap <<= 1
      val bigger = new Array[Long](cap)
      System.arraycopy(arr, 0, bigger, 0, n)
      arr = bigger
    }
    System.arraycopy(o.arr, 0, arr, n, o.n)
    n += o.n
  }
}

/** `sort_array(collect_list(longCol))` with a primitive buffer:
  * collects every non-null long of the group (duplicates kept, like
  * collect_list) and evaluates to the ascending-sorted array. The
  * result depends only on the value MULTISET — sorting erases the
  * partitioning/arrival order collect_list exposes — so it is
  * deterministic under any plan. Used for the adjacency lists feeding
  * [[SortedLongIntersectCount]]; the composable form is the spec
  * oracle (SortedLongListSpec pins equality and the cross-partition
  * merge path).
  *
  * Same ObjectHashAggregate regime as collect_list (object buffer →
  * group-count fallback to sort-based aggregation applies equally), so
  * swapping it in changes allocation behavior only, never the plan
  * shape. */
case class SortedLongListAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongVec] {

  override def createAggregationBuffer(): LongVec = new LongVec()

  override def update(buf: LongVec, input: InternalRow): LongVec = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: LongVec, b2: LongVec): LongVec = {
    b1.addAll(b2)
    b1
  }

  override def eval(buf: LongVec): Any = {
    val out = new Array[Long](buf.n)
    System.arraycopy(buf.arr, 0, out, 0, buf.n)
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def serialize(buf: LongVec): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongVec = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val v = new LongVec(new Array[Long](math.max(8, n)), 0)
    var i = 0
    while (i < n) { v.add(bb.getLong); i += 1 }
    v
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): SortedLongListAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SortedLongListAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SortedLongListAgg =
    copy(child = newChildren.head)
}

object SortedLongListAgg {
  /** Column-level API: all non-null longs of the group, ascending. */
  def sortedLongList(c: Column): Column =
    GraftColumnBridge.column(
      SortedLongListAgg(GraftColumnBridge.expression(c))
        .toAggregateExpression())
}
