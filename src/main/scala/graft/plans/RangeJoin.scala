package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, BoundReference, Expression,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, CodeGenerator, EmptyBlock, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native banded range join — the third whole-operator extension
  * (SURVEY §2.14): INNER-join each left row to every right row of the
  * same key whose time falls in `(left-time, left-time + bandUs]` —
  * the "events within the next N minutes" interval shape behind
  * attribution, co-occurrence, and burst detection.
  *
  * The declarative emulation (q_join_range) explodes each row into
  * time buckets and equi-joins on (key, bucket) with the band as a
  * residual — correct, but it doubles one side and filters bucket
  * false-positives. This operator declares the sort-merge shape
  * (ClusteredDistribution per side, (key, time, tiebreak) ordering)
  * and streams BOTH sides once with a sliding buffer holding only the
  * rights inside the current band: per co-partition the state is
  * O(band density), the theoretical minimum for this join — rights
  * are copied into the buffer once and evicted as the left cursor
  * passes them, never re-scanned.
  *
  * Keys/tiebreaks may be any orderable type (key types identical on
  * both sides; integral keys compare primitively) and times are
  * timestamps or raw long µs, as in [[AsofJoin]]; NULL keys or times
  * never match (SQL semantics). Validation happens in
  * [[RangeJoin.apply]], never in the node constructors (see
  * [[PlanUtil]] on canonicalization).
  */
case class RangeJoinLogical(
    leftKey: Expression, leftTime: Expression, leftTie: Expression,
    rightKey: Expression, rightTime: Expression, rightTie: Expression,
    bandUs: Long,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinLogical =
    copy(left = newLeft, right = newRight)
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: RangeJoinLogical =>
      RangeJoinExec(j.leftKey, j.leftTime, j.leftTie,
        j.rightKey, j.rightTime, j.rightTie, j.bandUs,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class RangeJoinExec(
    leftKey: Expression, leftTime: Expression, leftTie: Expression,
    rightKey: Expression, rightTime: Expression, rightTie: Expression,
    bandUs: Long,
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending),
      SortOrder(leftTie, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  // Pairs stream out grouped per left row in left order, so the left
  // child's partitioning and (key, time, tie) ordering survive.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    // Hoisted to locals: referencing fields inside zipPartitions would
    // capture `this` and serialize the whole subtree into every task.
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey
    val lTimeExpr = leftTime
    val rKeyExpr = rightKey
    val rTimeExpr = rightTime
    val keyType = leftKey.dataType
    val band = bandUs
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
      // The sliding band: rights of the saved key with time in
      // (last left time, last left time + band], in time order.
      val buf = new java.util.ArrayDeque[(Long, InternalRow)]()
      lIter.flatMap { l =>
        if (keys.setLeft(l) || lTime.read(l)) Iterator.empty
        else {
          val lt = lTime.value
          if (!keys.savedEqualsLeft()) { buf.clear(); keys.saveLeft() }
          // Consume rights up to the band's far edge: too-early ones
          // (rt <= lt) can never match this or any later left; ones
          // inside (lt, lt + band] enter the buffer. NULL key/time
          // rows are consumed unmatched (SQL semantics). The band test
          // is `rt - lt <= band`, not `rt <= lt + band`: the earlier
          // branch guarantees rt > lt, so the difference can't
          // overflow, while `lt + band` could for extreme raw-long
          // left times.
          var continue = rRow != null
          while (continue) {
            if (rKeyNull || rTimeNull) advance()
            else {
              val c = keys.cmpRightLeft()
              if (c < 0 || (c == 0 && rTime.value <= lt)) advance()
              else if (c == 0 && rTime.value - lt <= band) {
                buf.addLast((rTime.value, rRow.copy())); advance()
              } else continue = false
            }
            continue = continue && rRow != null
          }
          // Evict buffered rights the left cursor has passed.
          while (!buf.isEmpty && buf.peekFirst()._1 <= lt) buf.pollFirst()
          // Everything left in the buffer is a match: rt > lt by the
          // eviction, rt <= lt + band because left times only grow.
          val it = buf.iterator()
          new Iterator[InternalRow] {
            override def hasNext: Boolean = it.hasNext
            override def next(): InternalRow = result(joined(l, it.next()._2))
          }
        }
      }
    }
  }

  // ---- WholeStageCodegen participation --------------------------------
  //
  // Same structure as AsofJoinExec's codegen (including the accepted
  // display caveat documented there: the child SortExecs print this
  // stage's star without being fused): the stage starts here,
  // doProduce emits the sliding-buffer merge itself, the sorted
  // children arrive as the stage's two input iterators, and each
  // (left, buffered-right) pair flows to the downstream fused
  // operator as local vars. The band buffer is two parallel deques
  // (boxed time, UnsafeRow copy) in generated-class state — the same
  // O(band density) bound as the interpreted path. shouldStop() is
  // checked at LEFT-ROW boundaries only (best-effort by contract):
  // returning mid-buffer would need SMJ-style resumable inner-loop
  // state for no correctness gain, and the buffer is already the
  // operator's declared memory bound.
  // Integral, default-collation string, and composite struct keys
  // codegen (see PlanUtil.keyCodegen and the AsofJoinExec note);
  // everything else runs the interpreted path above.
  override def supportCodegen: Boolean =
    PlanUtil.keyCodegen(leftKey.dataType).isDefined &&
      leftTime.dataType == LongType && rightTime.dataType == LongType

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "rangeLeftInput", v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator",
      "rangeRightInput", v => s"$v = inputs[1];")
    val rightRow = ctx.addMutableState("InternalRow", "rangeRightRow")
    // supportCodegen gates on this being defined; the cursor key is a
    // view into the current row, only the saved band owner is cloned.
    val kc = PlanUtil.keyCodegen(leftKey.dataType).get
    val rKeyNull =
      ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "rangeRKeyNull")
    val rKey = ctx.addMutableState(kc.javaType, "rangeRKey")
    val rTimeNull =
      ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "rangeRTimeNull")
    val rTime = ctx.addMutableState(CodeGenerator.JAVA_LONG, "rangeRTime")
    val bufT = ctx.addMutableState("java.util.ArrayDeque", "rangeBufT",
      v => s"$v = new java.util.ArrayDeque();")
    val bufR = ctx.addMutableState("java.util.ArrayDeque", "rangeBufR",
      v => s"$v = new java.util.ArrayDeque();")
    val hasSaved =
      ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "rangeHasSaved")
    val savedKey =
      ctx.addMutableState(kc.javaType, "rangeSavedKey")
    val started =
      ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "rangeStarted")

    val rRowTmp = ctx.freshName("r")
    ctx.INPUT_ROW = rRowTmp
    ctx.currentVars = null
    val rKeyEv = BindReferences.bindReference(rightKey, right.output).genCode(ctx)
    val rTimeEv = BindReferences.bindReference(rightTime, right.output).genCode(ctx)
    val advanceFn = ctx.addNewFunction("rangeAdvance",
      s"""
         |private void rangeAdvance() {
         |  if ($rightInput.hasNext()) {
         |    InternalRow $rRowTmp = (InternalRow) $rightInput.next();
         |    ${rKeyEv.code}
         |    $rKeyNull = ${rKeyEv.isNull};
         |    $rKey = $rKeyNull
         |      ? ${kc.defaultValue} : ${kc.load(rKeyEv.value.toString)};
         |    ${rTimeEv.code}
         |    $rTimeNull = ${rTimeEv.isNull};
         |    $rTime = $rTimeNull ? 0L : (long)(${rTimeEv.value});
         |    $rightRow = $rRowTmp;
         |  } else {
         |    $rightRow = null;
         |  }
         |}
       """.stripMargin)

    val leftRowVar = ctx.freshName("rangeLeftRow")
    ctx.INPUT_ROW = leftRowVar
    ctx.currentVars = null
    val lKeyEv = BindReferences.bindReference(leftKey, left.output).genCode(ctx)
    val lTimeEv = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val leftVarsCode = evaluateVariables(leftVars)
    // Right vars load from the buffered match inside the emit loop;
    // inner join — no matched guard, nullability is per stored value.
    val mRow = ctx.freshName("rangeMatch")
    val rightVarDecls = new StringBuilder
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("rangeRN")
      val value = ctx.freshName("rangeRV")
      val javaType = CodeGenerator.javaType(a.dataType)
      rightVarDecls.append(
        s"""
           |boolean $isNull = $mRow.isNullAt($i);
           |$javaType $value = $isNull
           |  ? ${CodeGenerator.defaultValue(a.dataType)}
           |  : (${CodeGenerator.getValue(mRow, a.dataType, i.toString)});
         """.stripMargin)
      ExprCode(EmptyBlock, JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }
    val lKeyNull = ctx.freshName("rangeLKeyNull")
    val lKey = ctx.freshName("rangeLKey")
    val lTimeNull = ctx.freshName("rangeLTimeNull")
    val lTime = ctx.freshName("rangeLTime")
    val cont = ctx.freshName("rangeCont")
    val cmp = ctx.freshName("rangeCmp")
    val emitIt = ctx.freshName("rangeEmitIt")
    s"""
       |if (!$started) { $advanceFn(); $started = true; }
       |while ($leftInput.hasNext()) {
       |  InternalRow $leftRowVar = (InternalRow) $leftInput.next();
       |  ${lKeyEv.code}
       |  boolean $lKeyNull = ${lKeyEv.isNull};
       |  ${kc.javaType} $lKey = $lKeyNull
       |    ? ${kc.defaultValue} : ${kc.load(lKeyEv.value.toString)};
       |  ${lTimeEv.code}
       |  boolean $lTimeNull = ${lTimeEv.isNull};
       |  long $lTime = $lTimeNull ? 0L : (long)(${lTimeEv.value});
       |  if (!$lKeyNull && !$lTimeNull) {
       |    if (!$hasSaved || !(${kc.eq(savedKey, lKey)})) {
       |      $bufT.clear(); $bufR.clear();
       |      $savedKey = ${kc.save(lKey)}; $hasSaved = true;
       |    }
       |    boolean $cont = $rightRow != null;
       |    while ($cont) {
       |      if ($rKeyNull || $rTimeNull) {
       |        $advanceFn();
       |      } else {
       |        int $cmp = ${kc.cmp(rKey, lKey)};
       |        if ($cmp < 0 || ($cmp == 0 && $rTime <= $lTime)) {
       |          $advanceFn();
       |        } else if ($cmp == 0 && $rTime - $lTime <= ${bandUs}L) {
       |          $bufT.addLast(java.lang.Long.valueOf($rTime));
       |          $bufR.addLast($rightRow.copy());
       |          $advanceFn();
       |        } else {
       |          $cont = false;
       |        }
       |      }
       |      $cont = $cont && $rightRow != null;
       |    }
       |    while (!$bufT.isEmpty() &&
       |        ((java.lang.Long) $bufT.peekFirst()).longValue() <= $lTime) {
       |      $bufT.pollFirst(); $bufR.pollFirst();
       |    }
       |    $leftVarsCode
       |    java.util.Iterator $emitIt = $bufR.iterator();
       |    while ($emitIt.hasNext()) {
       |      InternalRow $mRow = (InternalRow) $emitIt.next();
       |      ${rightVarDecls.toString}
       |      ${consume(ctx, leftVars ++ rightVars)}
       |    }
       |  }
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)
}

object RangeJoin {
  /** INNER banded range join: each `left` row against every `right`
    * row with the same `keyCol` (any orderable type, identical on
    * both sides) and right time in `(left time, left time + bandUs]`.
    * Sides must be attribute-disjoint — see
    * [[graft.ops.Tables.fresh]]. */
  def apply(left: DataFrame, right: DataFrame,
            leftKey: String, leftTime: String, leftTie: String,
            rightKey: String, rightTime: String, rightTie: String,
            bandUs: Long): DataFrame = {
    require(bandUs > 0 && bandUs < Long.MaxValue / 2,
      s"range join: bandUs must be a positive, non-overflowing band " +
        s"width, got $bandUs")
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    PlanUtil.requireDisjoint(lp, rp, "range join")
    def a(p: LogicalPlan, n: String) = PlanUtil.resolve(p, n, "range join")
    val (lk, rk) = (a(lp, leftKey), a(rp, rightKey))
    Seq(lk, rk, a(lp, leftTie), a(rp, rightTie))
      .foreach(PlanUtil.requireOrderable(_, "range join"))
    require(lk.dataType == rk.dataType,
      s"range join: key types must match, found ${lk.dataType.sql} vs " +
        s"${rk.dataType.sql} — cast one side first")
    org.apache.spark.sql.graftbridge.Bridge.ofRows(left.sparkSession,
      RangeJoinLogical(
        a(lp, leftKey), PlanUtil.asMicros(a(lp, leftTime), "range join"),
        a(lp, leftTie),
        a(rp, rightKey), PlanUtil.asMicros(a(rp, rightTime), "range join"),
        a(rp, rightTie),
        bandUs, lp, rp))
  }
}
