package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled binary-search folds over SORTED one-row model tables — the
  * streaming-side scoring primitives ([[graft.streaming.Streaming
  * .classifierScoreStream]] / `.perplexityProxyStream`).
  *
  * Why they exist: the r18-interrupted build shipped both streaming
  * scorers as `aggregate()` HOF folds probing 1-row MAP columns, and
  * Catalyst's `GetMapValue` is a LINEAR scan over the map's key array
  * with an interpreted per-key equality — measured at sf0.1 (5k docs,
  * ~50 bigrams/doc, a ~1.4k-entry model) q220_stream_perplexity spent
  * 22.0 s of task CPU doing ~3x10^8 interpreted UTF8String compares,
  * and q219_stream_classifier ~2 s scanning its 1024-entry long-keyed
  * map per token. The model tables now land as one-row ARRAYS of
  * (key, value) structs sorted by key (sort_array over the same
  * collect_list), and these expressions fold a row's own features with
  * an O(log n)-per-probe compiled binary search — same playbook as
  * [[WordShingleHash64]] / [[ExciseSpans]]: the loop lives in a static
  * helper, so codegen composes it into whole-stage codegen.
  *
  * Contract shared by both: kv arrays are sorted ascending by key with
  * DISTINCT, NON-NULL elements and non-null keys — exactly what
  * sort_array(collect_list(struct(k, v))) over a grouped aggregate
  * emits (struct ordering sorts by the first field; UTF8String's
  * compareTo is the same unsigned-byte order sort_array uses). A null
  * probe key is a miss (contributes the same 0 the replaced
  * coalesce(map[k], 0) form produced).
  */
object ModelLookupSum {

  /** Lower-bound binary search for `key` in a sorted
    * array<struct<k:bigint, v:bigint>>; returns the value or 0L. */
  def lookupLong(kv: ArrayData, key: Long): Long = {
    var lo = 0
    var hi = kv.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val row = kv.getStruct(mid, 2)
      val k = row.getLong(0)
      if (k < key) lo = mid + 1
      else if (k > key) hi = mid - 1
      else return row.getLong(1)
    }
    0L
  }

  /** Same for array<struct<k:string, v:bigint>> (unsigned-byte key
    * order — UTF8String.compareTo, the order sort_array produced). */
  def lookupString(kv: ArrayData, key: UTF8String): Long = {
    var lo = 0
    var hi = kv.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val row = kv.getStruct(mid, 2)
      val c = row.getUTF8String(0).compareTo(key)
      if (c < 0) lo = mid + 1
      else if (c > 0) hi = mid - 1
      else return row.getLong(1)
    }
    0L
  }

  private def kvCheck(name: String, dt: DataType, keyType: DataType):
      TypeCheckResult = dt match {
    case ArrayType(st: StructType, _)
        if st.length == 2 && st.fields(0).dataType == keyType &&
          st.fields(1).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<struct<${keyType.catalogString},bigint>>, " +
        s"got ${other.catalogString}")
  }

  private[plans] def checkKvLong(name: String, dt: DataType): TypeCheckResult =
    kvCheck(name, dt, LongType)
  private[plans] def checkKvString(name: String, dt: DataType): TypeCheckResult =
    kvCheck(name, dt, StringType)
}

/** Sum over a row's probe keys of the matched values in a sorted
  * one-row (key, value) model table; misses and null keys add 0 —
  * bit-identical (within the documented |sum| < 2^63 Long domain, vs
  * the replaced form's DECIMAL(38,0) accumulator) to
  *
  *   aggregate(keys, 0, (acc, k) -> acc + coalesce(kv_map[k], 0))
  */
case class SortedKvLookupSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    left.dataType match {
      case ArrayType(LongType, _) =>
        ModelLookupSum.checkKvLong("sorted_kv_lookup_sum", right.dataType)
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_kv_lookup_sum requires array<bigint> keys, got ${other.catalogString}")
    }

  override protected def nullSafeEval(keys: Any, kv: Any): Any =
    SortedKvLookupSum.sum(
      keys.asInstanceOf[ArrayData], kv.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, kv) =>
      s"${ev.value} = graft.plans.SortedKvLookupSum.sum($k, $kv);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedKvLookupSum =
    copy(left = newLeft, right = newRight)
}

object SortedKvLookupSum {

  /** Column API: `kv` must be array<struct<bigint,bigint>> sorted by the
    * first field with distinct non-null keys (sort_array(collect_list(
    * struct(k, v))) output). */
  def apply(keys: Column, kv: Column): Column =
    GraftColumnBridge.column(SortedKvLookupSum(
      GraftColumnBridge.expression(keys),
      GraftColumnBridge.expression(kv)))

  def sum(keys: ArrayData, kv: ArrayData): Long = {
    val m = keys.numElements()
    var acc = 0L
    var i = 0
    while (i < m) {
      if (!keys.isNullAt(i))
        acc += ModelLookupSum.lookupLong(kv, keys.getLong(i))
      i += 1
    }
    acc
  }
}

/** Per-document CCNet-style surprisal sum over consecutive token pairs
  * against a sorted bigram model — bit-identical (within the Long
  * domain) to the replaced HOF form
  *
  *   aggregate(zip_with(slice(t,1,n-1), slice(t,2,n-1), pair), 0,
  *     (acc, p) -> acc + (coalesce(fm[p.w1], 0) + v) * 1000000
  *                       div (coalesce(pm[concat(p.w1,' ',p.w2)], 0) + 1)
  *                       - 1000000)
  *
  * including the null-token edges: a null w1 misses the prefix table,
  * a null w1 OR w2 nulls the concatenated pair key and misses the pair
  * table (concat's null propagation), both adding the same
  * (0+v)*1000000 div 1 - 1000000 term.
  *
  * children: (tokens array<string>, pairs array<struct<string,bigint>>
  * sorted by "w1 w2", prefixes array<struct<string,bigint>> sorted by
  * w1, v bigint >= 1).
  */
case class BigramSurprisalSum(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    first.dataType match {
      case ArrayType(StringType, _) =>
        val p = ModelLookupSum.checkKvString("bigram_surprisal_sum", second.dataType)
        if (p != TypeCheckResult.TypeCheckSuccess) p
        else {
          val f = ModelLookupSum.checkKvString("bigram_surprisal_sum", third.dataType)
          if (f != TypeCheckResult.TypeCheckSuccess) f
          else if (fourth.dataType == LongType) TypeCheckResult.TypeCheckSuccess
          else TypeCheckResult.TypeCheckFailure(
            s"vocab scalar must be bigint, got ${fourth.dataType.catalogString}")
        }
      case other => TypeCheckResult.TypeCheckFailure(
        s"bigram_surprisal_sum requires array<string> tokens, got ${other.catalogString}")
    }

  override protected def nullSafeEval(
      tokens: Any, pairs: Any, prefixes: Any, v: Any): Any =
    BigramSurprisalSum.sum(
      tokens.asInstanceOf[ArrayData], pairs.asInstanceOf[ArrayData],
      prefixes.asInstanceOf[ArrayData], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p, f, v) =>
      s"${ev.value} = graft.plans.BigramSurprisalSum.sum($t, $p, $f, $v);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression):
      BigramSurprisalSum = copy(f, s, t, q)
}

object BigramSurprisalSum {

  private val Space = UTF8String.fromString(" ")

  def apply(tokens: Column, pairs: Column, prefixes: Column, v: Column): Column =
    GraftColumnBridge.column(BigramSurprisalSum(
      GraftColumnBridge.expression(tokens),
      GraftColumnBridge.expression(pairs),
      GraftColumnBridge.expression(prefixes),
      GraftColumnBridge.expression(v)))

  def sum(tokens: ArrayData, pairs: ArrayData, prefixes: ArrayData,
      v: Long): Long = {
    val m = tokens.numElements()
    var acc = 0L
    var i = 0
    // walk consecutive pairs, carrying w2 over as the next w1 so each
    // token's bytes are extracted once
    var w1: UTF8String = if (m > 0 && !tokens.isNullAt(0))
      tokens.getUTF8String(0) else null
    while (i < m - 1) {
      val w2: UTF8String =
        if (tokens.isNullAt(i + 1)) null else tokens.getUTF8String(i + 1)
      val fm = if (w1 == null) 0L else ModelLookupSum.lookupString(prefixes, w1)
      val pm =
        if (w1 == null || w2 == null) 0L
        else ModelLookupSum.lookupString(
          pairs, UTF8String.concat(w1, Space, w2))
      // Long arithmetic mirrors the replaced expression exactly: the
      // (fm + v) * 1000000 product and the truncating integral divide
      // ran in LONG there too (only the accumulator was decimal).
      acc += (fm + v) * 1000000L / (pm + 1L) - 1000000L
      w1 = w2
      i += 1
    }
    acc
  }
}
