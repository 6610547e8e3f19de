package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, BoundReference, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, CodeGenerator, EmptyBlock, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

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
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode with CodegenSupport {

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

  // ---- WholeStageCodegen participation --------------------------------
  //
  // Same pattern as the built-in SortMergeJoinExec: the codegen STAGE
  // STARTS at this node (doProduce generates the merge loop itself and
  // never calls child.produce), the two sorted children feed in as the
  // stage's two input iterators, and every downstream fused operator
  // consumes (left columns ++ nullable right columns) as local vars —
  // no JoinedRow, no per-row UnsafeProjection, no iterator boundary.
  //
  // Covers integral, default-collation string, AND composite
  // struct-of-(integral|string) keys (the common LLM-pipeline id
  // shapes — PlanUtil.keyCodegen): integral keys live in one long
  // field, string keys in a UTF8String field whose binary compareTo
  // matches the planned sort order, struct keys in an InternalRow
  // field compared field-wise in the struct sort order. Other
  // orderable keys run
  // the interpreted doExecute above, which remains the semantic
  // reference — PlanShapeSpec pins codegen/interpreted equality and
  // the codegen-stage star for both key shapes.
  //
  // Known DISPLAY caveat (accepted): explain() prints the two SortExec
  // children with this stage's codegen star, as if fused — they are
  // not (they feed in via inputRDDs, exactly like SMJ's children).
  // Spark's CollapseCodegenStages special-cases SortMergeJoinExec /
  // ShuffledHashJoinExec BY CLASS to wrap their children in
  // InputAdapter; an extension operator cannot join that list, and
  // pre-wrapping the children from a post-planner rule strips the
  // sorts' own stage wrapping instead. Execution is unaffected — the
  // star on the sorts is cosmetic — so this stays as-is rather than
  // trading plan-surgery risk for display polish.
  override def supportCodegen: Boolean =
    PlanUtil.keyCodegen(leftKey.dataType).isDefined &&
      leftTime.dataType == LongType && rightTime.dataType == LongType

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // Left/right vars handed to consume hold UTF8String/array references
  // into the children's reused row buffers — the stage output must be
  // copied before anything retains it (same reasoning as SMJ).
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    // supportCodegen gates on this being defined. The right-cursor key
    // is a zero-copy view into the CURRENT right row (valid until the
    // next advance — same invariant as the interpreted MergeKeys);
    // only the saved key is owned (kc.save clones strings).
    val kc = PlanUtil.keyCodegen(leftKey.dataType).get
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator",
      "asofRightInput", v => s"$v = inputs[1];")
    val rightRow = ctx.addMutableState("InternalRow", "asofRightRow")
    val rKeyNull =
      ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofRKeyNull")
    val rKey = ctx.addMutableState(kc.javaType, "asofRKey")
    val rTimeNull =
      ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofRTimeNull")
    val rTime = ctx.addMutableState(CodeGenerator.JAVA_LONG, "asofRTime")
    val matchBuf = ctx.addMutableState(
      "org.apache.spark.sql.catalyst.expressions.UnsafeRow", "asofMatchBuf")
    val matchRow = ctx.addMutableState("InternalRow", "asofMatchRow")
    val hasSaved =
      ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofHasSaved")
    val savedKey = ctx.addMutableState(kc.javaType, "asofSavedKey")
    val started = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofStarted")

    // Right-cursor advance: read the next row and evaluate its
    // (key, time) into the primitive cursor fields.
    val rRowTmp = ctx.freshName("r")
    ctx.INPUT_ROW = rRowTmp
    ctx.currentVars = null
    val rKeyEv = BindReferences.bindReference(rightKey, right.output).genCode(ctx)
    val rTimeEv = BindReferences.bindReference(rightTime, right.output).genCode(ctx)
    val advanceFn = ctx.addNewFunction("asofAdvance",
      s"""
         |private void asofAdvance() {
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

    // Left-row evaluation + output vars.
    val leftRowVar = ctx.freshName("asofLeftRow")
    ctx.INPUT_ROW = leftRowVar
    ctx.currentVars = null
    val lKeyEv = BindReferences.bindReference(leftKey, left.output).genCode(ctx)
    val lTimeEv = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    // Emit the left-column loads eagerly; evaluateVariables clears the
    // ExprCode blocks so consume() won't emit them a second time.
    val leftVarsCode = evaluateVariables(leftVars)
    // Right output vars come from the remembered matchRow, guarded by
    // this row's match flag; every column is nullable on no-match. The
    // declarations are emitted by hand (one block below), so the
    // ExprCodes handed to consume carry empty code.
    val matched = ctx.freshName("asofMatched")
    val rightVarDecls = new StringBuilder
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofRN")
      val value = ctx.freshName("asofRV")
      val javaType = CodeGenerator.javaType(a.dataType)
      rightVarDecls.append(
        s"""
           |boolean $isNull = !$matched || $matchRow.isNullAt($i);
           |$javaType $value = $isNull
           |  ? ${CodeGenerator.defaultValue(a.dataType)}
           |  : (${CodeGenerator.getValue(matchRow, a.dataType, i.toString)});
         """.stripMargin)
      ExprCode(EmptyBlock, JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }
    val lKeyNull = ctx.freshName("asofLKeyNull")
    val lKey = ctx.freshName("asofLKey")
    val lTimeNull = ctx.freshName("asofLTimeNull")
    val lTime = ctx.freshName("asofLTime")
    val cont = ctx.freshName("asofCont")
    val cmp = ctx.freshName("asofCmp")
    val unsafeRowCls = "org.apache.spark.sql.catalyst.expressions.UnsafeRow"
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
       |  boolean $matched = false;
       |  if (!$lKeyNull && !$lTimeNull) {
       |    boolean $cont = $rightRow != null;
       |    while ($cont) {
       |      if ($rKeyNull || $rTimeNull) {
       |        $advanceFn();
       |      } else {
       |        int $cmp = ${kc.cmp(rKey, lKey)};
       |        if ($cmp < 0) {
       |          $advanceFn();
       |        } else if ($cmp == 0 && $rTime <= $lTime) {
       |          $savedKey = ${kc.save(rKey)}; $hasSaved = true;
       |          if ($rightRow instanceof $unsafeRowCls) {
       |            if ($matchBuf == null) {
       |              $matchBuf = (($unsafeRowCls) $rightRow).copy();
       |            } else {
       |              $matchBuf.copyFrom(($unsafeRowCls) $rightRow);
       |            }
       |            $matchRow = $matchBuf;
       |          } else {
       |            $matchRow = $rightRow.copy();
       |          }
       |          $advanceFn();
       |        } else {
       |          $cont = false;
       |        }
       |      }
       |      $cont = $cont && $rightRow != null;
       |    }
       |    $matched = $hasSaved && ${kc.eq(savedKey, lKey)}
       |      && $matchRow != null;
       |  }
       |  $leftVarsCode
       |  ${rightVarDecls.toString}
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
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
