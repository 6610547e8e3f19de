package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, BindReferences,
  Expression, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, CodeGenerator, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{CodegenSupport, SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Native sessionization — the whole-operator extension tier
  * (SURVEY §2.14): a custom logical node, planner strategy, and
  * physical operator registered through `SparkSessionExtensions`,
  * for semantics the built-in operators express only as TWO window
  * passes (lag-mark + running sum, q_win_sessionid).
  *
  * Semantics: scanning each key's rows in (time, tiebreak) order,
  * `session_id` starts at 1 and increments whenever the gap to the
  * previous row exceeds `gapUs` microseconds. Identical to the
  * declared window form — asserted row-for-row in PlanShapeSpec and
  * by the shared DuckDB oracle.
  *
  * Scale shape: the exec declares ClusteredDistribution(key) +
  * per-partition (key, time, tiebreak) ordering, so EnsureRequirements
  * plans exactly ONE hash exchange and one sort — after which the id
  * assignment is a single O(1)-state streaming pass per partition (no
  * second window pass, no frame buffering; Spark's Window operator
  * buffers each partition's frame). At 1000 executors it behaves like
  * any keyed window: one shuffle, then embarrassingly parallel.
  */
case class SessionizeLogical(
    key: Expression,
    time: Expression,
    tiebreak: Expression,
    gapUs: Long,
    child: LogicalPlan,
    sessionAttr: Attribute =
      AttributeReference("session_id", LongType, nullable = false)())
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ sessionAttr
  override def producedAttributes: AttributeSet = AttributeSet(sessionAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : SessionizeLogical = copy(child = newChild)
}

/** Planner strategy: one-to-one lowering of the logical node. */
object SessionizeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case s: SessionizeLogical =>
      SessionizeExec(s.key, s.time, s.tiebreak, s.gapUs, s.sessionAttr,
        planLater(s.child)) :: Nil
    case _ => Nil
  }
}

case class SessionizeExec(
    key: Expression,
    time: Expression,
    tiebreak: Expression,
    gapUs: Long,
    sessionAttr: Attribute,
    child: SparkPlan)
  extends UnaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = child.output :+ sessionAttr

  // sessionAttr is this node's own output, not an input reference —
  // without this the plan printer flags the node as missing input.
  override def producedAttributes: AttributeSet = AttributeSet(sessionAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(key)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(key, Ascending), SortOrder(time, Ascending),
      SortOrder(tiebreak, Ascending)))

  // Rows pass through in the child's partitioning and sorted order;
  // without this override the exec reports UnknownPartitioning and a
  // downstream rollup on (key, ...) pays a second, needless exchange.
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    // Hoisted to locals: referencing fields inside mapPartitions would
    // capture `this` and serialize the whole subtree into every task.
    val childOutput = child.output
    val gap = gapUs
    val keyExpr = key
    val tExpr = time
    val outTypes = output.map(_.dataType).toArray
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(
        Seq(BindReferences.bindReference(keyExpr, childOutput)))
      val timeRead = PlanUtil.longReader(
        BindReferences.bindReference(tExpr, childOutput))
      val result = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val sessRow = new GenericInternalRow(1)
      var curKey: UnsafeRow = null
      var lastTs = 0L
      var lastNull = false
      var sid = 0L
      iter.map { row =>
        // keyProj reuses its buffer — copy only on key change (one
        // small allocation per KEY, not per row).
        val k = keyProj(row)
        val tNull = timeRead.read(row)
        if (curKey == null || k != curKey) {
          curKey = k.copy(); sid = 1L
        } else if (lastNull) {
          // mirrors the window form: lag(us) IS NULL starts a new
          // session for the row AFTER a null-time row (a null gap
          // itself never extends a comparison — and never via raw
          // subtraction, which would overflow a MinValue anchor).
          sid += 1L
        } else if (!tNull && timeRead.value - lastTs > gap) {
          sid += 1L
        }
        lastNull = tNull
        if (!tNull) lastTs = timeRead.value
        sessRow.setLong(0, sid)
        result(joined(row, sessRow))
      }
    }, preservesPartitioning = true)
  }

  // ---- WholeStageCodegen participation --------------------------------
  //
  // The id assignment is a stateful streaming map — exactly the shape
  // produce/consume fuses: per input row, a handful of long/boolean
  // partition-local state updates, then hand (input :+ session_id) to
  // the downstream operator with NO iterator boundary, row
  // materialization, or interpreted eval. The generated class is
  // instantiated once per partition, so the zero-initialized mutable
  // state doubles as the per-partition reset.
  //
  // Codegen covers integral, default-collation string, AND composite
  // struct-of-(integral|string) keys (the common LLM-pipeline id
  // shapes, incl. (user_id, device_id) packed via struct — see
  // PlanUtil.keyCodegen);
  // other orderable keys run the interpreted doExecute below, which
  // remains the semantic reference (PlanShapeSpec asserts both paths
  // equal the window form, for long and string keys). The LongType
  // guard is defensive: the public Sessionize.apply always normalizes
  // time to long µs, but a directly-constructed node must fall back
  // rather than emit long-typed code over a non-long column.
  override def supportCodegen: Boolean =
    PlanUtil.keyCodegen(key.dataType).isDefined &&
      time.dataType == LongType

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  override protected def doProduce(ctx: CodegenContext): String =
    child.asInstanceOf[CodegenSupport].produce(ctx, this)

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
      row: ExprCode): String = {
    // supportCodegen gates on this being defined.
    val kc = PlanUtil.keyCodegen(key.dataType).get
    val hasKey = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "sessHasKey")
    val lastKeyNull =
      ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "sessLastKeyNull")
    // The saved key must survive cursor advances: kc.save owns the
    // value (clone for strings — the input var is a view into a
    // reused row buffer), at one small allocation per KEY RUN.
    val lastKey = ctx.addMutableState(kc.javaType, "sessLastKey")
    val lastTs = ctx.addMutableState(CodeGenerator.JAVA_LONG, "sessLastTs")
    val lastNull =
      ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "sessLastNull")
    val sid = ctx.addMutableState(CodeGenerator.JAVA_LONG, "sessSid")
    // Evaluate every input column first: all of them flow to the
    // downstream consume anyway, and it keeps the key/time genCode
    // below from splicing column evaluation into conditional blocks.
    val evalInputs = evaluateVariables(input)
    ctx.currentVars = input
    val keyEv = BindReferences.bindReference(key, child.output).genCode(ctx)
    val timeEv = BindReferences.bindReference(time, child.output).genCode(ctx)
    val kNull = ctx.freshName("keyNull")
    val kVal = ctx.freshName("keyVal")
    val tNull = ctx.freshName("tNull")
    val tVal = ctx.freshName("tVal")
    val sidVar = ctx.freshName("sessionId")
    val sidCode = ExprCode(code"long $sidVar = $sid;",
      FalseLiteral, JavaCode.variable(sidVar, LongType))
    s"""
       |$evalInputs
       |${keyEv.code}
       |${timeEv.code}
       |boolean $kNull = ${keyEv.isNull};
       |${kc.javaType} $kVal =
       |  $kNull ? ${kc.defaultValue} : ${kc.load(keyEv.value.toString)};
       |boolean $tNull = ${timeEv.isNull};
       |long $tVal = $tNull ? 0L : (long)(${timeEv.value});
       |if (!$hasKey || $kNull != $lastKeyNull ||
       |    (!$kNull && !(${kc.eq(kVal, lastKey)}))) {
       |  $hasKey = true; $lastKeyNull = $kNull;
       |  $lastKey = $kNull ? ${kc.defaultValue} : ${kc.save(kVal)};
       |  $sid = 1L;
       |} else if ($lastNull) {
       |  $sid += 1L;
       |} else if (!$tNull && $tVal - $lastTs > ${gapUs}L) {
       |  $sid += 1L;
       |}
       |$lastNull = $tNull;
       |if (!$tNull) $lastTs = $tVal;
       |${consume(ctx, input :+ sidCode)}
     """.stripMargin
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : SessionizeExec = copy(child = newChild)
}

object Sessionize {
  /** Append a `session_id` column: per `keyCol`, ids increment when
    * consecutive `tsCol` values (ordered with `tieCol` as tiebreak)
    * gap by more than `gapUs` microseconds. `tsCol` is a timestamp
    * column (evaluated as unix_micros) or already raw long micros;
    * null times follow the window form's lag-IS-NULL semantics. */
  def apply(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
            gapUs: Long): DataFrame = {
    val plan = df.queryExecution.analyzed
    require(!plan.output.exists(_.name == "session_id"),
      "sessionize: input already has a session_id column — rename it " +
        "first, or the output would carry an ambiguous duplicate")
    def a(n: String): Attribute = PlanUtil.resolve(plan, n, "sessionize")
    // asMicros validates the time column driver-side (BIGINT µs or any
    // timestamp flavor incl. NTZ) with the same clear message as the
    // join operators, instead of a raw analysis error in a task.
    val time: Expression = PlanUtil.asMicros(a(tsCol), "sessionize")
    org.apache.spark.sql.graftbridge.Bridge.ofRows(df.sparkSession,
      SessionizeLogical(a(keyCol), time, a(tieCol), gapUs, plan))
  }
}
