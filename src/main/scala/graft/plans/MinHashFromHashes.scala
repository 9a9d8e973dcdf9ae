package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native k-permutation MinHash fold over pre-hashed shingles —
  * bit-identical to the composable form
  * [[graft.functions.text.minhashFromHashes]]:
  *
  *   aggregate(hs, array(k x Long.Max),
  *     (acc, h) -> zip_with(acc, array((h*a_i + b_i) % p), least))
  *
  * including the null-element edge (a null hash's permuted value is
  * NULL, and least() ignores nulls, so null elements update nothing)
  * and the affine arithmetic domain (a < 2^31, h < 2^32 ->
  * a*h + b < 2^63, no overflow). The HOF form runs interpreted with a
  * k-element array allocated per (element, permutation) pair — k x |hs|
  * lambda dispatches per row; this is one compiled two-level loop with
  * a single output array. `perms` are the caller's (a_i, b_i) constants
  * ([[graft.functions.text.minhashPerm]]) so the permutation family
  * stays defined in exactly one place.
  */
case class MinHashFromHashesNative(child: Expression,
    perms: Seq[(Long, Long)], prime: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if perms.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure("need at least one permutation")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_from_hashes requires array<bigint>, got ${other.catalogString}")
  }

  private lazy val as: Array[Long] = perms.map(_._1).toArray
  private lazy val bs: Array[Long] = perms.map(_._2).toArray

  override protected def nullSafeEval(input: Any): Any =
    MinHashFromHashesNative.minima(
      input.asInstanceOf[ArrayData], as, bs, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("as", as, "long[]")
      val bRef = ctx.addReferenceObj("bs", bs, "long[]")
      s"${ev.value} = graft.plans.MinHashFromHashesNative.minima($c, $aRef, $bRef, ${prime}L);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashFromHashesNative = copy(child = newChild)
}

object MinHashFromHashesNative {

  def apply(hs: Column, perms: Seq[(Long, Long)], prime: Long): Column =
    GraftColumnBridge.column(MinHashFromHashesNative(
      GraftColumnBridge.expression(hs), perms, prime))

  def minima(hs: ArrayData, as: Array[Long], bs: Array[Long],
      prime: Long): ArrayData = {
    val k = as.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val m = hs.numElements()
    var i = 0
    while (i < m) {
      if (!hs.isNullAt(i)) { // null permuted values update nothing (least)
        val h = hs.getLong(i)
        var j = 0
        while (j < k) {
          val v = (h * as(j) + bs(j)) % prime
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
