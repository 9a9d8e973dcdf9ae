package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-document 60-bit SimHash over a token array — bit-identical to
  * the explode + 60-sum aggregate form [[graft.operators.Dedup.simhash]]
  * used through r18:
  *
  *   explode(tokens) -> h = conv(substr(md5(tok), 1, 15), 16, 10)
  *   groupBy(id).agg(60 x sum(if((h >> b) & 1 = 1, 1, -1)))
  *   -> sum over b of if(balance_b > 0, 1 << b, 0)
  *
  * Why it exists (r19 optimization round): SimHash is a PURE PER-ROW
  * function of the document's own tokens — each token's 60-bit md5
  * hash votes +1/-1 per bit position and the sign of each balance sets
  * the output bit — yet the composable form paid a full corpus
  * explode, a 60-expression partial aggregate, and a shuffle keyed on
  * id to compute it. This expression computes the signature in one
  * compiled loop per row: zero exchanges, zero aggregate state, one
  * md5 per token (the hex-string + conv() round-trip replaced by
  * reading the digest's first 7.5 bytes directly — the same value
  * conv(substr(hex, 1, 15), 16, 10) parses, since the md5 hex string
  * IS the digest in hex).
  *
  * Contract: one signature per ROW (the operator's callers key rows by
  * a unique document id; the old grouped form would have merged the
  * token streams of duplicate ids — no caller does that). A null token
  * array yields NULL (the old form dropped those ids at the explode);
  * a null token ELEMENT votes -1 on every bit exactly like the grouped
  * form's when/otherwise (see hash()). An empty array (unreachable
  * from split(), which yields [""] at minimum) produces all-zero
  * balances, hence signature 0 — the grouped form had no row to group
  * there, a shape no caller produces.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHash60.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {

  def apply(tokens: Column): Column =
    GraftColumnBridge.column(SimHash60(GraftColumnBridge.expression(tokens)))

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5(bytes) as an unsigned 60-bit long: the
    * first 7 digest bytes plus the high nibble of the 8th — exactly
    * the value conv(substr(md5_hex, 1, 15), 16, 10) parses. */
  def md5Hash60(md: MessageDigest, bytes: Array[Byte]): Long = {
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    (h << 4) | ((d(7) & 0xF0L) >>> 4)
  }

  def hash(tokens: ArrayData): Long = {
    val md = md5Local.get()
    val m = tokens.numElements()
    val bal = new Array[Int](60)
    var i = 0
    while (i < m) {
      // a null element votes -1 on every bit, exactly like the grouped
      // form: md5(null) is null, (null >> b) & 1 = 1 is NULL, and the
      // when() falls through to otherwise(-1) — the same votes h = 0
      // casts, so null rides the h = 0 path.
      val h =
        if (tokens.isNullAt(i)) 0L
        else md5Hash60(md, tokens.getUTF8String(i).getBytes)
      var b = 0
      while (b < 60) {
        bal(b) += (((h >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (bal(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}
