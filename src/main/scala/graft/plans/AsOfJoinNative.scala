package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of (point-in-time) join — the (c)-tier of the custom
  * operator ladder: a whole-operator `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, registered through `SparkSessionExtensions`
  * (`GraftExtensions`).
  *
  * The compositional form (`operators.AsOf`, the (a)-tier) expresses
  * the same semantics with union + last(ignoreNulls) window, which is
  * correct but pays for it structurally: the union stream carries a
  * null-padded struct column for EVERY left row through the shuffle,
  * the window buffers and re-sorts the merged stream, and the matched
  * right row rides the rest of the plan as a struct to unpack. The
  * native operator is what a database would plan: hash-partition both
  * sides on the key, sort each side once, and stream a two-pointer
  * merge per partition — no union row inflation, no struct padding,
  * no window state. Same asymptotic cost (one shuffle per side +
  * per-partition sort), strictly less data movement and residency.
  *
  * At cluster scale the shape degrades exactly like a sort-merge join
  * (its requirements are a subset of SMJ's): both sides exchange on
  * the key, AQE coalesces the two shuffles as one group, and the merge
  * itself is O(|left| + |right|) per partition with O(1) state — one
  * buffered right row. Skewed keys behave like SMJ skew (one task owns
  * the key's rows); the merge state stays O(1) regardless.
  *
  * Semantics (DuckDB ASOF JOIN LEFT, pandas merge_asof): each left row
  * matches the latest right row with the same key and right.ts <=
  * left.ts; among right rows tied on (key, ts) the greatest tie-break
  * value wins; unmatched left rows keep null right columns. Optional
  * tolerance drops matches staler than `toleranceUs` microseconds.
  */
object AsOfNative {

  /** Logical node. Children must have DISJOINT output attribute ids
    * (rename one side before joining — enforced in [[asofJoinLeft]]);
    * key/ts/tie are resolved attributes of the respective child. */
  final case class AsOfJoinPlan(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKey: Attribute,
      rightKey: Attribute,
      leftTs: Attribute,
      rightTs: Attribute,
      rightTie: Attribute,
      toleranceUs: Option[Long]) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: AsOfJoinPlan → AsOfJoinExec, children planned
    * later (standard strategy contract). */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lk, rk, lts, rts, tie, tol) =>
        AsOfJoinExec(lk, rk, lts, rts, tie, tol,
          planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Physical as-of merge join.
    *
    * Declares the SAME child requirements as a sort-merge join
    * restricted to one equi-key plus a time ordering: clustered
    * distribution on the key for both children (EnsureRequirements
    * inserts co-partitioned hash exchanges; AQE coalesces them as one
    * group) and per-child sort orders (key, ts) / (key, ts, tie). The
    * merge keeps exactly ONE buffered right row — the latest one at or
    * before the current left timestamp for the current key — so the
    * tie rule (max tie-break among equal ts) falls out of the sort
    * order for free: later rows in (key, ts, tie) order overwrite the
    * buffer while still <= the left timestamp.
    */
  final case class AsOfJoinExec(
      leftKey: Expression,
      rightKey: Expression,
      leftTs: Expression,
      rightTs: Expression,
      rightTie: Expression,
      toleranceUs: Option[Long],
      left: SparkPlan,
      right: SparkPlan) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKey :: Nil) ::
        ClusteredDistribution(rightKey :: Nil) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
        SortOrder(rightTie, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = Seq(
      SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val keyOrdering =
        TypeUtils.getInterpretedOrdering(leftKey.dataType)
      val lKey = BindReferences.bindReference(leftKey, left.output)
      val lTs = BindReferences.bindReference(leftTs, left.output)
      val rKey = BindReferences.bindReference(rightKey, right.output)
      val rTs = BindReferences.bindReference(rightTs, right.output)
      val tol = toleranceUs
      val rightSchema = right.output
      val outputAttrs = output
      val lRdd = left.execute()
      val rRdd = right.execute()
      require(lRdd.getNumPartitions == rRdd.getNumPartitions,
        s"as-of join children must be co-partitioned " +
          s"(${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions})")
      lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
        val nullRight = new GenericInternalRow(rightSchema.length)
        val joined = new JoinedRow
        val project = UnsafeProjection.create(outputAttrs, outputAttrs)
        // One-row right-side state: the latest right row (copied — the
        // child iterator reuses its UnsafeRow) at or before the left
        // cursor, plus a lookahead.
        var bufRow: InternalRow = null
        var bufKey: Any = null
        var bufTs: Long = 0L
        var nextRow: InternalRow = null
        var nextKey: Any = null
        var nextTs: Long = 0L
        def advanceLookahead(): Unit = {
          nextRow = null
          while (nextRow == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rKey.eval(r)
            val t = rTs.eval(r)
            // Null keys and null timestamps never match anything (SQL
            // semantics: ts >= NULL is never true) — skip them here so
            // the merge state only ever holds matchable rows.
            if (k != null && t != null) {
              nextRow = r
              nextKey = k
              nextTs = t.asInstanceOf[Long]
            }
          }
        }
        advanceLookahead()
        lIter.map { lRow =>
          val k = lKey.eval(lRow)
          val tsV = lTs.eval(lRow)
          if (k != null && tsV != null) {
            val ts = tsV.asInstanceOf[Long]
            // Consume right rows while they are for an earlier key, or
            // for this key at-or-before the left timestamp. The last
            // consumed row for THIS key is the as-of candidate.
            var advancing = true
            while (advancing && nextRow != null) {
              val c = keyOrdering.compare(nextKey, k)
              if (c < 0 || (c == 0 && nextTs <= ts)) {
                bufRow = nextRow.copy()
                // Re-derive key/ts FROM THE COPY: nextKey may be a view
                // (UTF8String) into the child iterator's reused/spilled
                // row buffer, which the advanceLookahead() below
                // overwrites — a stale view would corrupt the buffered
                // key and match the wrong key's row.
                bufKey = rKey.eval(bufRow)
                bufTs = rTs.eval(bufRow).asInstanceOf[Long]
                advanceLookahead()
              } else advancing = false
            }
          }
          val matched = k != null && tsV != null && bufRow != null &&
            keyOrdering.compare(bufKey, k) == 0 &&
            bufTs <= tsV.asInstanceOf[Long] &&
            tol.forall(t => tsV.asInstanceOf[Long] - bufTs <= t)
          project(joined(lRow, if (matched) bufRow else nullRight))
        }
      }
    }
  }

  /** Left as-of join through the native operator. Right-side columns
    * must not collide with the left's (rename first) — enforced here
    * because the logical node carries both outputs verbatim. */
  def asofJoinLeft(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightTie: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    require(lPlan.output.map(_.name).intersect(rPlan.output.map(_.name)).isEmpty,
      "as-of join sides must have disjoint column names (alias the right side)")
    require(lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "as-of join sides must not share attribute ids (self-join: re-alias one side)")
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lts, rts) = (attr(lPlan, leftTs), attr(rPlan, rightTs))
    // Fail fast on type mismatches: differently-typed keys hash to
    // different partitions (Int vs Long Murmur3) and the interpreted
    // ordering throws mid-task — neither failure names the cause.
    require(lk.dataType == rk.dataType,
      s"as-of key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(lts.dataType == rts.dataType,
      s"as-of timestamp types differ: ${lts.dataType} vs ${rts.dataType}")
    val node = AsOfJoinPlan(lPlan, rPlan,
      lk, rk, lts, rts, attr(rPlan, rightTie), toleranceUs)
    org.apache.spark.sql.GraftColumnBridge.ofRows(spark, node)
  }

  /** Idempotent runtime registration for sessions built without the
    * `spark.sql.extensions=graft.plans.GraftExtensions` config (the
    * deploy path). Uses the sanctioned `experimental.extraStrategies`
    * hook; a strategy registered twice is harmless (it pattern-matches
    * or returns Nil) but avoided anyway. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.exists(_ eq AsOfJoinStrategy) &&
        !cs.sessionState.planner.strategies.exists(_ eq AsOfJoinStrategy)) {
      cs.experimental.extraStrategies =
        AsOfJoinStrategy +: cs.experimental.extraStrategies
    }
  }
}
