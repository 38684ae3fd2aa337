package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{
  DataType, DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Native as-of join — the engine's whole-operator Catalyst extension:
  * a custom `LogicalPlan` node, a `SparkStrategy` planning it, and a
  * physical `SparkPlan` executing it (the (c) rung of SURVEY.md §4.3's
  * escalation ladder, one level past the `Rule[LogicalPlan]` + codegen
  * `Expression` work in [[GraftExtensions]]).
  *
  * Semantics (LEFT OUTER, DuckDB `ASOF LEFT JOIN` convention, the same
  * contract as the composition form [[graft.operators.AsOfJoin]]): for
  * each left row, attach the latest right row with an equal key and
  * `right.time <= left.time`; unmatched left rows keep NULL right
  * columns. Key equality is null-safe (null keys group together, as in
  * the window formulation) — callers with nullable keys should filter.
  *
  * Physical shape: `EnsureRequirements` sees the declared
  * `ClusteredDistribution`/ordering requirements and co-partitions +
  * sorts both sides by (key, time) — exactly one exchange per side,
  * the same cost envelope as a sort-merge join. `doExecute` then runs
  * a SINGLE forward merge pass per partition: the right pointer only
  * advances, the only buffered state is ONE candidate row per key
  * (`O(1)` memory regardless of key skew — the union-sort window form
  * carries the same running value but pays for tagging/unioning the
  * rows and a window operator; this pass is the plan that formulation
  * simulates). At 100 TB the cost is the two key-hash shuffles and the
  * per-partition sorts, both on pruned columns.
  *
  * Equal (key, time) right rows resolve by the greatest `tiebreak`
  * (appended to the right sort order, last-consumed-wins) — the
  * composition form's documented convention, which the shared DuckDB
  * oracle replays.
  *
  * `forward = true` flips the direction (pandas `merge_asof`
  * `direction='forward'`): each left row takes the EARLIEST right row
  * with `right.time >= left.time` — the conversion-window join ("next
  * purchase after the click"). Same physical shape, and the merge gets
  * SIMPLER: the candidate is the right head itself, no buffered match
  * at all (equal-time ties resolve to the smallest tiebreak — the
  * first row in sort order).
  *
  * `nearest = true` (pandas `direction='nearest'`) picks whichever of
  * the two directional candidates sits closer in time, equal distance
  * resolving BACKWARD (the pandas convention). The insight that keeps
  * this a SINGLE pass: in the backward merge the at-or-after candidate
  * is always sitting un-consumed at the right head (rows `<= lTime`
  * were folded into the buffered match; the head is the earliest later
  * row of the key, smallest tiebreak first) — so nearest is the
  * backward pass plus ONE head peek and a distance compare, one
  * exchange+sort pair per side instead of the two full backward+forward
  * joins the round-8 composition paid (2× the I/O for the same
  * answer). With a tolerance, each direction's candidate is
  * window-checked independently before the pick — exactly pandas,
  * since any farther row in a direction is out of window whenever that
  * direction's nearest candidate is.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Option[Expression],
    tolerance: Option[Long],
    forward: Boolean,
    nearest: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; a no-op on every other
  * node so it composes with the built-in strategies. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb, tol, fwd, near) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb, tol, fwd, near) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Option[Expression],
    tolerance: Option[Long],
    forward: Boolean,
    nearest: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the equi-keys: EnsureRequirements
  // inserts the (at most) one exchange per side, same as a shuffle join
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // per-partition (key..., time) order is what makes the single merge
  // pass correct; the right side additionally orders equal timestamps
  // by the tiebreak so "last consumed wins" is deterministic
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ Seq(rightTime) ++ rightTiebreak.toSeq)
      .map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  // event-time columns surface as long-comparable primitives
  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case other => sys.error(s"unsupported as-of time value: $other")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val outTypes = output.map(_.dataType).toArray
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val lTimeEval = BindReferences.bindReference(leftTime, lOut)
      val rTimeEval = BindReferences.bindReference(rightTime, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      // ordinal-based projection: immune to duplicate exprIds across
      // sides (self-as-of on one source table)
      val resultProj = UnsafeProjection.create(outTypes)

      new Iterator[InternalRow] {
        // right lookahead (copied: child iterators reuse row buffers)
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTime: Long = 0L
        private var rTimeNull = false
        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next().copy()
            rKey = rKeyProj(rRow).copy()
            val t = rTimeEval.eval(rRow)
            rTimeNull = t == null
            rTime = if (rTimeNull) 0L else asLong(t)
          } else rRow = null
        advanceRight()

        // current best match for the key under the cursor
        private var matchRow: InternalRow = _
        private var matchKey: UnsafeRow = _
        private var matchTime: Long = 0L

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lt = lTimeEval.eval(l)
          val lTime = if (lt == null) 0L else asLong(lt)
          val m = if (nearest) nextNearest(lKey, lt, lTime)
                  else if (forward) nextForward(lKey, lt, lTime)
                  else nextBackward(lKey, lt, lTime)
          resultProj(joined(l, m))
        }

        /** Latest right row at-or-before the left time; tolerance
          * checks that LATEST match only (pandas semantics — older
          * rows are farther away by the sort order, so if the latest
          * is out of window, every candidate is). */
        private def nextBackward(lKey: UnsafeRow, lt: Any,
            lTime: Long): InternalRow = {
          if (matchRow != null && keyOrd.compare(matchKey, lKey) != 0) {
            matchRow = null; matchKey = null
          }
          if (lt != null) {
            var done = false
            while (!done && rRow != null) {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) advanceRight() // older key: discard
              else if (c == 0 && rTimeNull) advanceRight() // never matches
              else if (c == 0 && rTime <= lTime) {
                matchRow = rRow; matchKey = rKey; matchTime = rTime // last wins
                advanceRight()
              } else done = true // future key, or right time past left
            }
          }
          if (matchRow != null && lt != null &&
              keyOrd.compare(matchKey, lKey) == 0 &&
              tolerance.forall(lTime - matchTime <= _)) matchRow
          else nullRight
        }

        /** Earliest right row at-or-after the left time: rows strictly
          * before it (or on older keys, or null-timed — nulls sort
          * first per key) are discarded, and the remaining HEAD is the
          * candidate — no buffered match at all. Safe because left
          * times are non-decreasing within a key: a discarded right row
          * can never serve a later left row. */
        private def nextForward(lKey: UnsafeRow, lt: Any,
            lTime: Long): InternalRow = {
          if (lt == null) return nullRight // no comparable time: no match
          var done = false
          while (!done && rRow != null) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0 || (c == 0 && (rTimeNull || rTime < lTime))) advanceRight()
            else done = true
          }
          if (rRow != null && keyOrd.compare(rKey, lKey) == 0 &&
              rTime >= lTime && tolerance.forall(rTime - lTime <= _)) rRow
          else nullRight
        }

        /** Closer of the two directional candidates, ties backward
          * (pandas `direction='nearest'`). The backward consumption
          * loop runs unchanged — and once it stops, the right HEAD is
          * exactly the forward candidate (first row of this key with
          * time > lTime, smallest tiebreak), un-consumed and free to
          * become a later left row's backward match. Each direction
          * window-checks independently: a direction whose nearest
          * candidate is out of tolerance contributes nothing (every
          * farther row in that direction is farther out). */
        private def nextNearest(lKey: UnsafeRow, lt: Any,
            lTime: Long): InternalRow = {
          if (matchRow != null && keyOrd.compare(matchKey, lKey) != 0) {
            matchRow = null; matchKey = null
          }
          if (lt == null) return nullRight
          var done = false
          while (!done && rRow != null) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) advanceRight()
            else if (c == 0 && rTimeNull) advanceRight()
            else if (c == 0 && rTime <= lTime) {
              matchRow = rRow; matchKey = rKey; matchTime = rTime
              advanceRight()
            } else done = true
          }
          val haveBack = matchRow != null &&
            keyOrd.compare(matchKey, lKey) == 0 &&
            tolerance.forall(lTime - matchTime <= _)
          // head time is strictly > lTime here (<= rows were consumed)
          val haveFwd = rRow != null && !rTimeNull &&
            keyOrd.compare(rKey, lKey) == 0 &&
            tolerance.forall(rTime - lTime <= _)
          if (haveBack && (!haveFwd || lTime - matchTime <= rTime - lTime))
            matchRow
          else if (haveFwd) rRow
          else nullRight
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame front door for the native operator. Arms the strategy on
  * the session (idempotently, via the public `experimental` hook — the
  * driver owns session construction, so build-time `withExtensions` is
  * not assumed), re-aliases the right side so a self-as-of never
  * carries duplicate attribute ids into one plan, and validates the
  * time columns are long-comparable. */
object AsOfJoinNative {
  private val timeTypes: Set[DataType] =
    Set(LongType, IntegerType, TimestampType, TimestampNTZType, DateType)

  /** @param tolerance optional max allowed time DISTANCE between the
    *   matched rows — `leftTime - rightTime` backward,
    *   `rightTime - leftTime` when `forward` — in the time column's
    *   PHYSICAL units (microseconds for timestamps, days for dates,
    *   raw values for int/long). The nearest candidate in the join
    *   direction is found first, then the window check applies to IT —
    *   pandas `merge_asof(tolerance=...)` semantics: a key whose
    *   nearest candidate is out of window yields NULLs, never a
    *   farther row.
    * @param forward false (default) = latest right row at-or-BEFORE
    *   the left time; true = earliest right row at-or-AFTER it
    *   (pandas `direction='forward'`).
    * @param nearest true = closer of the two directional candidates,
    *   equal distance resolving backward (pandas
    *   `direction='nearest'`); mutually exclusive with `forward`.
    *   Still ONE merge pass — see [[AsOfJoinPlan]]'s scaladoc. */
  def asOf(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      rightTiebreak: Option[String] = None,
      tolerance: Option[Long] = None,
      forward: Boolean = false,
      nearest: Boolean = false): DataFrame = {
    require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
      "as-of join needs matching non-empty key lists")
    require(!(forward && nearest),
      "forward and nearest directions are mutually exclusive")
    val spark = left.sparkSession
    GraftExtensions.registerRuntime(spark)
    val lPlan = left.queryExecution.analyzed
    // fresh exprIds for every right column: left and right may share a
    // source scan (self-as-of), and duplicate ids across join sides
    // corrupt attribute binding
    val rAnalyzed = right.queryExecution.analyzed
    val rPlan = Project(
      rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        sys.error(s"as-of column '$name' not found in ${out.map(_.name)}"))
    val rOut: Seq[Attribute] = rPlan.output
    val lt = attr(lPlan.output, leftTime)
    val rt = attr(rOut, rightTime)
    Seq(lt, rt).foreach(a => require(timeTypes(a.dataType),
      s"as-of time column '${a.name}' must be time/integral, " +
        s"got ${a.dataType.catalogString}"))
    // no analyzer coercion runs on a custom node, so mismatched types
    // would SILENTLY corrupt the join (different hash partitioning per
    // side; a Date-vs-Timestamp pair compares day numbers against
    // microseconds) — reject instead of mis-joining
    require(lt.dataType == rt.dataType,
      s"as-of time columns must share one type, got " +
        s"${lt.dataType.catalogString} vs ${rt.dataType.catalogString}")
    leftKeys.zip(rightKeys).foreach { case (lName, rName) =>
      val (la, ra) = (attr(lPlan.output, lName), attr(rOut, rName))
      require(la.dataType == ra.dataType,
        s"as-of key '$lName'/'$rName' types differ: " +
          s"${la.dataType.catalogString} vs ${ra.dataType.catalogString}")
    }
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))
    GraftColumnBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      leftKeys.map(attr(lPlan.output, _)), rightKeys.map(attr(rOut, _)),
      lt, rt, rightTiebreak.map(attr(rOut, _)), tolerance, forward, nearest))
  }
}
