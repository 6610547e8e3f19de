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
  * Keys and tiebreaks are LONG and times are timestamps or raw long
  * µs — the fixture surface; generalizing is an ordering parameter,
  * not a new algorithm. Ties at equal right-time resolve to the
  * largest tiebreak, matching the emulated form's (ts, tag, event_id)
  * window order. Validation happens in [[AsofJoin.apply]], never in
  * the node constructors (see [[PlanUtil]] on canonicalization).
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
    val outTypes = output.map(_.dataType).toArray
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = BindReferences.bindReference(lKeyExpr, lOut)
      val lTime = BindReferences.bindReference(lTimeExpr, lOut)
      val result = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      val r = new PlanUtil.EvalCursor(rIter,
        BindReferences.bindReference(rKeyExpr, rOut),
        BindReferences.bindReference(rTimeExpr, rOut))
      // O(1) state: the most recent right row consumed, with its key.
      var matchRow: InternalRow = null
      var matchKey = 0L
      // SQL as-of semantics: NULL keys and NULL times never match.
      // NULLS FIRST ordering puts null-key/null-time rows at the head
      // of each partition; they are consumed (right) or null-joined
      // (left) without ever being remembered as a match.
      lIter.map { l =>
        val lkv = lKey.eval(l)
        val ltv = lTime.eval(l)
        if (lkv == null || ltv == null) result(joined(l, nullRight))
        else {
          val lk = lkv.asInstanceOf[Long]
          val lt = ltv.asInstanceOf[Long]
          var continue = r.row != null
          while (continue) {
            if (r.keyV == null || r.timeV == null) {
              // unmatched by construction — consume and move on
              r.advance()
            } else {
              val rk = r.keyV.longValue()
              if (rk < lk || (rk == lk && r.timeV.longValue() <= lt)) {
                matchKey = rk
                matchRow = r.row.copy()
                r.advance()
              } else continue = false
            }
            continue = continue && r.row != null
          }
          if (matchRow != null && matchKey == lk) result(joined(l, matchRow))
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
    * row (same long `keyCol`s, right time ≤ left time; ties at equal
    * time take the largest long `tieCol`). The sides must be
    * attribute-disjoint — for self-joins read the right side through
    * [[graft.ops.Tables.fresh]]. */
  def apply(left: DataFrame, right: DataFrame,
            leftKey: String, leftTime: String, leftTie: String,
            rightKey: String, rightTime: String, rightTie: String)
      : DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    PlanUtil.requireDisjoint(lp, rp, "asof join")
    def a(p: LogicalPlan, n: String) = PlanUtil.resolve(p, n, "asof join")
    Seq(a(lp, leftKey), a(rp, rightKey), a(lp, leftTie), a(rp, rightTie))
      .foreach(PlanUtil.requireLong(_, "asof join"))
    org.apache.spark.sql.graftbridge.Bridge.ofRows(left.sparkSession,
      AsofJoinLogical(
        a(lp, leftKey), PlanUtil.asMicros(a(lp, leftTime), "asof join"),
        a(lp, leftTie),
        a(rp, rightKey), PlanUtil.asMicros(a(rp, rightTime), "asof join"),
        a(rp, rightTie),
        lp, rp))
  }
}
