package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native LEFT OUTER as-of join — a whole-operator extension
  * (SURVEY §2.14): for each left row, attach the LATEST right row of
  * the same key with right-time ≤ left-time (NULL when none), the
  * point-in-time lookup behind backfills and feature attribution.
  *
  * The built-in emulation (q_join_asof) union-tags both sides and runs
  * a `last(_, ignoreNulls)` window over the merged stream — correct,
  * but it shuffles LEFT+RIGHT rows together and buffers window frames.
  * This operator instead declares the classic sort-merge shape:
  * ClusteredDistribution on each side's key + per-partition
  * (key, time, tiebreak) ordering, then a single two-pointer pass per
  * co-partition with O(1) state (the one remembered right row). At
  * 1000 executors that is one keyed exchange per side and a streaming
  * merge — the same cost model as a sort-merge join, minus any
  * buffering of equal-key runs.
  *
  * Keys may be any orderable type with identical left/right types
  * (integral keys compare primitively, others through the type's
  * interpreted ordering); times are timestamps or raw long µs;
  * tiebreaks any orderable type. Ties at equal right-time resolve to
  * the largest tiebreak, matching the emulated form's
  * (ts, tag, event_id) window order. Validation happens in
  * [[AsofJoin.apply]], never in the node constructors (see
  * [[PlanUtil]] on canonicalization).
  */
case class AsofJoinLogical(
    leftKey: Expression, leftTime: Expression, leftTie: Expression,
    rightKey: Expression, rightTime: Expression, rightTie: Expression,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinLogical =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsofJoinLogical =>
      AsofJoinExec(j.leftKey, j.leftTime, j.leftTie,
        j.rightKey, j.rightTime, j.rightTie,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKey: Expression, leftTime: Expression, leftTie: Expression,
    rightKey: Expression, rightTime: Expression, rightTie: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending),
      SortOrder(leftTie, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  // Output rows are left rows (plus nullable right columns), still in
  // the left child's partitioning and order; without the partitioning
  // override downstream keyed operators would re-shuffle needlessly.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    // Everything the closure needs is hoisted to locals: referencing
    // fields inside zipPartitions would capture `this` and serialize
    // the whole physical subtree into every task.
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey
    val lTimeExpr = leftTime
    val rKeyExpr = rightKey
    val rTimeExpr = rightTime
    val keyType = leftKey.dataType
    val outTypes = output.map(_.dataType).toArray
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keys = PlanUtil.mergeKeys(keyType,
        BindReferences.bindReference(lKeyExpr, lOut),
        BindReferences.bindReference(rKeyExpr, rOut))
      val lTime = PlanUtil.longReader(
        BindReferences.bindReference(lTimeExpr, lOut))
      val rTime = PlanUtil.longReader(
        BindReferences.bindReference(rTimeExpr, rOut))
      val result = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      // Right-side cursor: current row plus its key/time, evaluated
      // once per advance through the primitive readers.
      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      var rKeyNull = rRow == null || keys.setRight(rRow)
      var rTimeNull = rRow == null || rTime.read(rRow)
      def advance(): Unit = {
        rRow = if (rIter.hasNext) rIter.next() else null
        if (rRow != null) {
          rKeyNull = keys.setRight(rRow)
          rTimeNull = rTime.read(rRow)
        }
      }
      // O(1) state: the most recent candidate right row, memcpy'd into
      // one reused buffer (rows with key < left key can never match a
      // current or later left row and are skipped without any copy —
      // the per-advance allocation was the measured cost that made
      // this operator slower than its window emulation).
      val matchBuf = new PlanUtil.RowBuffer
      var matchRow: InternalRow = null
      // SQL as-of semantics: NULL keys and NULL times never match.
      // NULLS FIRST ordering puts null-key/null-time rows at the head
      // of each partition; they are consumed (right) or null-joined
      // (left) without ever being remembered as a match.
      lIter.map { l =>
        if (keys.setLeft(l) || lTime.read(l)) result(joined(l, nullRight))
        else {
          val lt = lTime.value
          var continue = rRow != null
          while (continue) {
            if (rKeyNull || rTimeNull) {
              // unmatched by construction — consume and move on
              advance()
            } else {
              val c = keys.cmpRightLeft()
              if (c < 0) advance() // dead key: never a match, no copy
              else if (c == 0 && rTime.value <= lt) {
                keys.saveRight()
                matchRow = matchBuf.set(rRow)
                advance()
              } else continue = false
            }
            continue = continue && rRow != null
          }
          if (matchRow != null && keys.savedEqualsLeft())
            result(joined(l, matchRow))
          else result(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {
  /** LEFT OUTER as-of join of `left` to the latest matching `right`
    * row (equal `keyCol`s — any orderable type, identical on both
    * sides; right time ≤ left time; ties at equal time take the
    * largest `tieCol`). The sides must be attribute-disjoint — for
    * self-joins read the right side through
    * [[graft.ops.Tables.fresh]]. */
  def apply(left: DataFrame, right: DataFrame,
            leftKey: String, leftTime: String, leftTie: String,
            rightKey: String, rightTime: String, rightTie: String)
      : DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    PlanUtil.requireDisjoint(lp, rp, "asof join")
    def a(p: LogicalPlan, n: String) = PlanUtil.resolve(p, n, "asof join")
    val (lk, rk) = (a(lp, leftKey), a(rp, rightKey))
    Seq(lk, rk, a(lp, leftTie), a(rp, rightTie))
      .foreach(PlanUtil.requireOrderable(_, "asof join"))
    require(lk.dataType == rk.dataType,
      s"asof join: key types must match, found ${lk.dataType.sql} vs " +
        s"${rk.dataType.sql} — cast one side first")
    org.apache.spark.sql.graftbridge.Bridge.ofRows(left.sparkSession,
      AsofJoinLogical(
        a(lp, leftKey), PlanUtil.asMicros(a(lp, leftTime), "asof join"),
        a(lp, leftTie),
        a(rp, rightKey), PlanUtil.asMicros(a(rp, rightTime), "asof join"),
        a(rp, rightTie),
        lp, rp))
  }
}
