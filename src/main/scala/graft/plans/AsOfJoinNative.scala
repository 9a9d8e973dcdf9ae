package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, HashPartitioning, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

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
  * the keys, AQE coalesces the two shuffles as one group, and the
  * merge itself is O(|left| + |right|) per partition with O(1) state —
  * one buffered right row. Skewed keys behave like SMJ skew (one task
  * owns the key's rows); the merge state stays O(1) regardless.
  *
  * Semantics (DuckDB ASOF JOIN LEFT, pandas merge_asof): each left row
  * matches the latest right row with the same key tuple and right.ts
  * <= left.ts; among right rows tied on (keys, ts) the greatest
  * tie-break value wins; unmatched left rows keep null right columns.
  * Optional tolerance drops matches staler than `toleranceUs`
  * microseconds. Keys are COMPOSITE (DuckDB ASOF takes any number of
  * equality conditions alongside the one inequality; same here): the
  * single-key form is the one-element case.
  *
  * FORWARD direction (pandas merge_asof direction='forward', DuckDB
  * ASOF with the inequality flipped to left.ts <= right.ts): each left
  * row matches the EARLIEST right row with right.ts >= left.ts; among
  * ties on (keys, ts) the LEAST non-null tie-break value wins (the
  * mirror of backward's greatest — backward takes the last row the
  * cursor passes under a NULLS FIRST tie sort, forward the first row
  * it reaches under NULLS LAST; each direction's null ordering is
  * chosen so null ties lose to non-null ones exactly like the
  * arg_max/arg_min aggregates the oracles use, while an all-null tie
  * group still matches). Tolerance drops matches further
  * than `toleranceUs` ahead. The forward merge is strictly simpler:
  * the lookahead row IS the candidate (it may match many left rows, so
  * it is never consumed by a match), and no buffered-row copy exists
  * at all — right rows strictly behind the left cursor can never match
  * a later left row because left is also time-sorted.
  *
  * NEAREST direction (pandas merge_asof direction='nearest'): both
  * candidates at once — the backward buffer (latest right.ts <=
  * left.ts, max tie) and the forward lookahead (earliest right.ts >
  * left.ts, min tie; STRICTLY after, since equal-ts rows belong to the
  * backward side) — and the smaller absolute gap wins, ties going
  * backward. With a tolerance, each side is eligible only if its own
  * gap is within it, then the nearest eligible side wins. One pass,
  * same O(1) state as backward (the forward candidate is the lookahead
  * that already existed). Nearest shares backward's physical sort
  * (NULLS FIRST ties), so its FORWARD candidate resolves a null-vs-
  * non-null tie at the same future (keys, ts) to the null row — use a
  * non-null tie column with nearest when that corner matters (the
  * q192 oracle does). The DuckDB oracle for this is two ASOF joins
  * (>= and <) CASE-merged on the gap comparison — q192 pins all three
  * directions' tie rules cross-engine.
  */
object AsOfNative {

  /** Logical node. Children must have DISJOINT output attribute ids
    * (rename one side before joining — enforced in [[asofJoinLeft]]);
    * keys/ts/tie are resolved attributes of the respective child. */
  final case class AsOfJoinPlan(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKeys: Seq[Attribute],
      rightKeys: Seq[Attribute],
      leftTs: Attribute,
      rightTs: Attribute,
      rightTie: Attribute,
      toleranceUs: Option[Long],
      direction: String) extends BinaryNode {
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
      case AsOfJoinPlan(l, r, lks, rks, lts, rts, tie, tol, dir) =>
        AsOfJoinExec(lks, rks, lts, rts, tie, tol, dir,
          planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Physical as-of merge join.
    *
    * Declares the SAME child requirements as a sort-merge join
    * restricted to equi-keys plus a time ordering: clustered
    * distribution on the keys for both children (EnsureRequirements
    * inserts co-partitioned hash exchanges; AQE coalesces them as one
    * group) and per-child sort orders (keys…, ts) / (keys…, ts, tie).
    * The merge keeps exactly ONE buffered right row — the latest one
    * at or before the current left timestamp for the current key — so
    * the tie rule (max tie-break among equal ts) falls out of the sort
    * order for free: later rows in (keys, ts, tie) order overwrite the
    * buffer while still <= the left timestamp.
    */
  final case class AsOfJoinExec(
      leftKeys: Seq[Expression],
      rightKeys: Seq[Expression],
      leftTs: Expression,
      rightTs: Expression,
      rightTie: Expression,
      toleranceUs: Option[Long],
      direction: String,
      left: SparkPlan,
      right: SparkPlan) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) ::
        ClusteredDistribution(rightKeys) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
      // Tie null-ordering is DIRECTION-DEPENDENT so null ties mirror
      // the aggregate functions the oracles use: backward's "last row
      // wins" needs NULLS FIRST (any non-null tie overwrites the null
      // one — arg_max semantics, which ignore nulls unless the group
      // is all-null); forward's "first row wins" needs NULLS LAST for
      // the same reason (arg_min). Nearest shares one physical sort,
      // so it keeps backward's exact rule and its FORWARD candidate
      // inherits nulls-first — a null tie among equal-(key, ts) future
      // rows wins there; callers wanting strict arg_min ties on the
      // forward side of nearest should use a non-null tie column (the
      // q192 oracle does).
      val tieOrder =
        if (direction == "forward")
          SortOrder(rightTie, Ascending,
            org.apache.spark.sql.catalyst.expressions.NullsLast, Seq.empty)
        else SortOrder(rightTie, Ascending)
      Seq(
        leftKeys.map(SortOrder(_, Ascending)) :+
          SortOrder(leftTs, Ascending),
        rightKeys.map(SortOrder(_, Ascending)) ++
          Seq(SortOrder(rightTs, Ascending), tieOrder))
    }

    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] =
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val keyOrderings =
        leftKeys.map(k => TypeUtils.getInterpretedOrdering(k.dataType))
      val lKeyB = leftKeys.map(BindReferences.bindReference(_, left.output))
      val lTs = BindReferences.bindReference(leftTs, left.output)
      val rKeyB = rightKeys.map(BindReferences.bindReference(_, right.output))
      val rTs = BindReferences.bindReference(rightTs, right.output)
      val nKeys = leftKeys.length
      val tol = toleranceUs
      val fwd = direction == "forward"
      val near = direction == "nearest"
      // The API validates direction; a plan constructed directly with a
      // typo'd string must fail here rather than silently running the
      // backward merge.
      require(fwd || near || direction == "backward",
        s"unknown as-of direction '$direction' " +
          "(expected backward/forward/nearest)")
      val rightSchema = right.output
      val outputAttrs = output
      // Co-partitioning contract: EnsureRequirements satisfied both
      // ClusteredDistributions above with the SAME shuffle-spec
      // compatibility check it applies to sort-merge joins, so by
      // construction the two children hash the i-th key with the same
      // partitioner into the same number of partitions, and AQE's
      // coalescing treats sibling shuffles of one stage as a single
      // group (AsOfNativeSpec pins this with AQE + skew + deliberately
      // unequal input partitioning). The requires below are therefore
      // BACKSTOPS against a planner change, not the mechanism: verify
      // equal partition counts, and — when both sides expose hash
      // partitionings — that they cluster on the as-of keys in the
      // same positions, so a same-count/different-partitioner pairing
      // cannot zip silently.
      (left.outputPartitioning, right.outputPartitioning) match {
        case (lh: HashPartitioning, rh: HashPartitioning) =>
          val lPos = lh.expressions.map(e =>
            leftKeys.indexWhere(_.semanticEquals(e)))
          val rPos = rh.expressions.map(e =>
            rightKeys.indexWhere(_.semanticEquals(e)))
          require(lPos == rPos && !lPos.contains(-1),
            "as-of join children are hash-partitioned on different key " +
              s"positions (left ${lh.expressions} vs right ${rh.expressions} " +
              s"over keys $leftKeys / $rightKeys) — EnsureRequirements " +
              "should have co-partitioned them")
        case _ => () // single partition / unknown: count check below
      }
      val lRdd = left.execute()
      val rRdd = right.execute()
      require(lRdd.getNumPartitions == rRdd.getNumPartitions,
        s"as-of join children must be co-partitioned " +
          s"(${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions}); " +
          "EnsureRequirements guarantees this for both exchanges of one " +
          "stage, and AQE coalesces them as one group")
      lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
        val nullRight = new GenericInternalRow(rightSchema.length)
        val joined = new JoinedRow
        val project = UnsafeProjection.create(outputAttrs, outputAttrs)
        // Compares two fully-evaluated key tuples component-wise in key
        // order — consistent with the requiredChildOrdering above, so
        // the merge's monotonic advance agrees with the sort.
        def compareKeys(a: Array[Any], b: Array[Any]): Int = {
          var i = 0
          while (i < nKeys) {
            val c = keyOrderings(i).compare(a(i), b(i))
            if (c != 0) return c
            i += 1
          }
          0
        }
        // Evaluates a side's key exprs into a fresh tuple, or null when
        // ANY component is null (SQL equality: a null key never equals
        // anything, so such rows can never match).
        def evalKeys(exprs: Seq[Expression], row: InternalRow): Array[Any] = {
          val out = new Array[Any](nKeys)
          var i = 0
          while (i < nKeys) {
            val v = exprs(i).eval(row)
            if (v == null) return null
            out(i) = v
            i += 1
          }
          out
        }
        // One-row right-side state: the latest right row (copied — the
        // child iterator reuses its UnsafeRow) at or before the left
        // cursor, plus a lookahead.
        var bufRow: InternalRow = null
        var bufKey: Array[Any] = null
        var bufTs: Long = 0L
        var nextRow: InternalRow = null
        var nextKey: Array[Any] = null
        var nextTs: Long = 0L
        def advanceLookahead(): Unit = {
          nextRow = null
          while (nextRow == null && rIter.hasNext) {
            val r = rIter.next()
            val k = evalKeys(rKeyB, r)
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
        // Shared by the backward and nearest merges: consume right rows
        // for an earlier key, or for this key at-or-before the left
        // timestamp, into the backward buffer. The last consumed row
        // for THIS key is the backward as-of candidate; afterwards the
        // lookahead — when still on this key — is STRICTLY after the
        // cursor. Key/ts are re-derived FROM THE COPY: nextKey
        // components may be views (UTF8String) into the child
        // iterator's reused/spilled row buffer, which the
        // advanceLookahead() below overwrites — a stale view would
        // corrupt the buffered key and match the wrong key's row.
        def consumeThrough(k: Array[Any], ts: Long): Unit = {
          var advancing = true
          while (advancing && nextRow != null) {
            val c = compareKeys(nextKey, k)
            if (c < 0 || (c == 0 && nextTs <= ts)) {
              bufRow = nextRow.copy()
              bufKey = evalKeys(rKeyB, bufRow)
              bufTs = rTs.eval(bufRow).asInstanceOf[Long]
              advanceLookahead()
            } else advancing = false
          }
        }
        if (fwd) lIter.map { lRow =>
          // Forward merge: discard right rows strictly behind the left
          // cursor (left is time-sorted too, so they can never match a
          // later left row either), then the lookahead itself is the
          // candidate — first row at-or-after the cursor in the
          // (keys, ts, tie) sort = earliest ts, least tie. It is NOT
          // consumed on a match: the same future row may serve many
          // left rows. No copy is ever taken — nextKey/nextTs are
          // views into the row the iterator just produced, and no
          // further next() happens before the comparison below.
          val k = evalKeys(lKeyB, lRow)
          val tsV = lTs.eval(lRow)
          if (k != null && tsV != null) {
            val ts = tsV.asInstanceOf[Long]
            var advancing = true
            while (advancing && nextRow != null) {
              val c = compareKeys(nextKey, k)
              if (c < 0 || (c == 0 && nextTs < ts)) advanceLookahead()
              else advancing = false
            }
          }
          val matched = k != null && tsV != null && nextRow != null &&
            compareKeys(nextKey, k) == 0 &&
            nextTs >= tsV.asInstanceOf[Long] &&
            tol.forall(t => nextTs - tsV.asInstanceOf[Long] <= t)
          project(joined(lRow, if (matched) nextRow else nullRight))
        } else if (near) lIter.map { lRow =>
          // Nearest merge: advance exactly like backward, then compare
          // the two gaps. Both candidates already exist in the merge
          // state backward maintains; nearest adds no state.
          val k = evalKeys(lKeyB, lRow)
          val tsV = lTs.eval(lRow)
          var matchedRow: InternalRow = null
          if (k != null && tsV != null) {
            val ts = tsV.asInstanceOf[Long]
            consumeThrough(k, ts)
            // Eligibility is per-side (each gap against the tolerance),
            // then the smaller gap wins, ties going BACKWARD — pandas
            // merge_asof(direction='nearest') semantics.
            val bOk = bufRow != null && compareKeys(bufKey, k) == 0 &&
              bufTs <= ts && tol.forall(t => ts - bufTs <= t)
            val fOk = nextRow != null && compareKeys(nextKey, k) == 0 &&
              tol.forall(t => nextTs - ts <= t)
            matchedRow =
              if (bOk && (!fOk || ts - bufTs <= nextTs - ts)) bufRow
              else if (fOk) nextRow
              else null
          }
          project(joined(lRow,
            if (matchedRow != null) matchedRow else nullRight))
        } else lIter.map { lRow =>
          val k = evalKeys(lKeyB, lRow)
          val tsV = lTs.eval(lRow)
          if (k != null && tsV != null) {
            consumeThrough(k, tsV.asInstanceOf[Long])
          }
          val matched = k != null && tsV != null && bufRow != null &&
            compareKeys(bufKey, k) == 0 &&
            bufTs <= tsV.asInstanceOf[Long] &&
            tol.forall(t => tsV.asInstanceOf[Long] - bufTs <= t)
          project(joined(lRow, if (matched) bufRow else nullRight))
        }
      }
    }
  }

  /** Timestamp types the merge can order as a primitive long without a
    * per-row branch: TIMESTAMP / TIMESTAMP_NTZ store micros-since-epoch
    * as Long internally; integral types cover pre-extracted epoch
    * columns. Anything else (DateType's Int days, DecimalType, …) must
    * be cast by the caller — checked at the API so an unsupported type
    * fails fast with its name instead of an executor-side
    * ClassCastException mid-task. */
  private def isLongBackedTs(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | LongType => true
    case _ => false
  }

  /** Left as-of join through the native operator, composite-key form.
    * Right-side columns must not collide with the left's (rename
    * first) — enforced here because the logical node carries both
    * outputs verbatim. `direction` is "backward" (default: latest
    * right.ts <= left.ts, max tie), "forward" (earliest right.ts >=
    * left.ts, min tie) or "nearest" (smaller absolute gap of the two,
    * ties backward) — see the object doc for the exact tie
    * semantics. */
  def asofJoinLeftMulti(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightTie: String,
      toleranceUs: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      s"as-of key lists must be non-empty and same length " +
        s"($leftKeys vs $rightKeys)")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"as-of direction must be 'backward', 'forward' or 'nearest' " +
        s"(got '$direction')")
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
    val lks = leftKeys.map(attr(lPlan, _))
    val rks = rightKeys.map(attr(rPlan, _))
    val (lts, rts) = (attr(lPlan, leftTs), attr(rPlan, rightTs))
    val tie = attr(rPlan, rightTie)
    // Fail fast on type problems: differently-typed keys hash to
    // different partitions (Int vs Long Murmur3), a non-orderable key
    // breaks the merge's interpreted ordering, and a non-Long-backed
    // timestamp dies in the merge's primitive extraction — none of
    // those executor-side failures names its cause.
    lks.zip(rks).foreach { case (lk, rk) =>
      require(lk.dataType == rk.dataType,
        s"as-of key types differ: ${lk.name}: ${lk.dataType} vs " +
          s"${rk.name}: ${rk.dataType}")
      require(RowOrdering.isOrderable(lk.dataType),
        s"as-of key ${lk.name} has non-orderable type ${lk.dataType}")
    }
    require(lts.dataType == rts.dataType,
      s"as-of timestamp types differ: ${lts.dataType} vs ${rts.dataType}")
    require(isLongBackedTs(lts.dataType),
      s"as-of timestamps must be TIMESTAMP, TIMESTAMP_NTZ or BIGINT " +
        s"(got ${lts.dataType}); cast DATE/other types explicitly")
    require(RowOrdering.isOrderable(tie.dataType),
      s"as-of tie-break ${tie.name} has non-orderable type ${tie.dataType}")
    val node = AsOfJoinPlan(lPlan, rPlan, lks, rks, lts, rts, tie,
      toleranceUs, direction)
    org.apache.spark.sql.GraftColumnBridge.ofRows(spark, node)
  }

  /** Single-key form (the common case; see [[asofJoinLeftMulti]]). */
  def asofJoinLeft(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightTie: String,
      toleranceUs: Option[Long] = None,
      direction: String = "backward"): DataFrame =
    asofJoinLeftMulti(left, right, Seq(leftKey), Seq(rightKey),
      leftTs, rightTs, rightTie, toleranceUs, direction)

  /** Idempotent runtime registration for sessions built without the
    * `spark.sql.extensions=graft.plans.GraftExtensions` config (the
    * deploy path). Uses the sanctioned `experimental.extraStrategies`
    * hook. The read-modify-write is synchronized on the session's
    * experimental-methods holder: two threads registering concurrently
    * would otherwise race the Seq swap, and while a DUPLICATE strategy
    * is harmless (it pattern-matches or returns Nil), a lost update
    * dropping some OTHER caller's concurrently-added strategy is not. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.experimental.synchronized {
      if (!cs.experimental.extraStrategies.exists(_ eq AsOfJoinStrategy) &&
          !cs.sessionState.planner.strategies.exists(_ eq AsOfJoinStrategy)) {
        cs.experimental.extraStrategies =
          AsOfJoinStrategy +: cs.experimental.extraStrategies
      }
    }
  }
}
