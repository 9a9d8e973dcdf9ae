package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}

/** Native span excision: tokens (array<string>) minus every position
  * covered by a span list (array<struct<start_tok:bigint,
  * end_tok:bigint>>) — semantically identical to the composable form
  *
  *   filter(tokens, (_, i) -> !exists(spans,
  *     s -> i >= s.start_tok AND i <= s.end_tok))
  *
  * (a spec pins the parity, including overlapping/unsorted/duplicate
  * spans, spans beyond the document end, and starts up to Long.Max),
  * but ONE compiled merged sweep instead of an interpreted
  * O(tokens x spans) filter. Parity holds for any span list with
  * non-null elements — the only shape the producing aggregates
  * (collect_list) emit; a NULL span ELEMENT covers nothing here,
  * where the HOF form's three-valued logic would drop every
  * uncovered token (see [[ExciseSpans.excise]]).
  *
  * Why it exists: higher-order lambdas run OUTSIDE whole-stage codegen,
  * and the exists() probe is re-run per token over the whole span list.
  * On span-SPARSE corpora that is invisible (a handful of spans per
  * affected doc); on the template-heavy corpora span removal exists FOR
  * (the r18 span-dense deep shape: ~200 disjoint 5-token spans in a
  * ~2000-token doc, ~50% coverage) it is ~tokens x spans interval
  * checks per document — the measured wall that motivated this class
  * (same playbook as [[WordShingleHash64]]).
  *
  * The sweep sorts span starts once (spans arrive in collect_list
  * order), then walks tokens with a cursor, folding any overlap into a
  * running activeEnd — O(T + S log S) per row, no per-token allocation,
  * and it composes into whole-stage codegen via a static helper call.
  */
case class ExciseSpans(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = left.dataType

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(st: StructType, _))
          if st.length >= 2 && st.fields(0).dataType == LongType &&
            st.fields(1).dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          "excise_spans requires (array<string>, array<struct<bigint," +
            s"bigint,...>>), got ${l.catalogString} / ${r.catalogString}")
    }

  override protected def nullSafeEval(tokens: Any, spans: Any): Any =
    ExciseSpans.excise(
      tokens.asInstanceOf[ArrayData], spans.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = graft.plans.ExciseSpans.excise($t, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExciseSpans =
    copy(left = newLeft, right = newRight)
}

object ExciseSpans {

  /** Column API: `spans` must be array<struct> whose FIRST TWO fields
    * are the span's start/end token positions (inclusive), as built by
    * collect_list(struct(start_tok, end_tok)). */
  def apply(tokens: Column, spans: Column): Column =
    GraftColumnBridge.column(ExciseSpans(
      GraftColumnBridge.expression(tokens),
      GraftColumnBridge.expression(spans)))

  /** One merged sweep per row. Span starts sort via packed
    * (start << 24 | index) longs — span counts stay under 2^24 (an
    * ArrayData bound), and starts clamp into [0, numTokens]: coverage
    * below token 0 cannot exclude anything, a start at or past the
    * document end covers nothing (the sweep never reaches it), and the
    * clamp makes the pack overflow-proof for ANY Long input — an
    * unclamped start >= 2^40 would wrap the shift, activate at token 0
    * and excise the whole document (the opposite of the HOF form).
    * A null span element is treated as covering nothing — here the
    * native sweep deliberately DIVERGES from the composable
    * filter/exists form, whose three-valued logic would drop EVERY
    * token once one null span element exists (exists() yields SQL NULL
    * for tokens no real span covers, and filter() drops on NULL);
    * unreachable from collect_list output, where elements are never
    * null, so the parity contract excludes null elements explicitly. */
  def excise(tokens: ArrayData, spans: ArrayData): ArrayData = {
    val m = tokens.numElements()
    val s = spans.numElements()
    if (s == 0 || m == 0) return tokens.copy()
    val keys = new Array[Long](s)
    var j = 0
    while (j < s) {
      if (spans.isNullAt(j)) {
        // a start sentinel at the document end: never activates in the
        // sweep (covers nothing); low 24 bits keep the element index
        // like every other key.
        keys(j) = (m.toLong << 24) | j.toLong
      } else {
        val start = math.min(m.toLong,
          math.max(0L, spans.getStruct(j, 2).getLong(0)))
        keys(j) = (start << 24) | j.toLong
      }
      j += 1
    }
    java.util.Arrays.sort(keys)
    val out = new Array[Any](m)
    var kept = 0
    var cursor = 0
    var activeEnd = -1L
    var i = 0
    while (i < m) {
      while (cursor < s && (keys(cursor) >>> 24) <= i) {
        val idx = (keys(cursor) & 0xFFFFFF).toInt
        if (!spans.isNullAt(idx)) {
          val e = spans.getStruct(idx, 2).getLong(1)
          if (e > activeEnd) activeEnd = e
        }
        cursor += 1
      }
      if (i > activeEnd) {
        out(kept) =
          if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
        kept += 1
      }
      i += 1
    }
    if (kept == m) tokens.copy()
    else new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[Object]], kept))
  }
}
