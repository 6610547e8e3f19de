package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Expression, UnixMicros}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Shared plumbing for the native merge operators (AsofJoin,
  * RangeJoin, Sessionize): column resolution with clear driver-side
  * errors, time normalization to long microseconds, and the
  * evaluated-head cursor their streaming merges share.
  *
  * Validation lives HERE (in the public apply helpers), never in the
  * logical nodes' constructors: Catalyst re-runs constructors during
  * canonicalization with exprIds renumbered from zero, where any
  * constructor-time invariant over child outputs is spuriously
  * violated (a body require fired on every cache lookup once any
  * DataFrame was cached).
  */
private[plans] object PlanUtil {

  def resolve(plan: LogicalPlan, name: String, op: String): Attribute =
    plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"$op: no column '$name' in ${plan.output.map(_.name)}"))

  /** A time column as long µs: raw BIGINT passes through, timestamps
    * evaluate as unix_micros (NTZ via an instant-preserving cast —
    * sessions pin UTC). Anything else fails here, not in a task. */
  def asMicros(at: Attribute, op: String): Expression = at.dataType match {
    case LongType => at
    case TimestampType => UnixMicros(at)
    case TimestampNTZType => UnixMicros(Cast(at, TimestampType))
    case other => throw new IllegalArgumentException(
      s"$op: time column '${at.name}' must be BIGINT microseconds or a " +
        s"timestamp, found ${other.sql}")
  }

  def requireLong(at: Attribute, op: String): Unit =
    require(at.dataType == LongType,
      s"$op: column '${at.name}' must be BIGINT, found ${at.dataType.sql}")

  def requireDisjoint(l: LogicalPlan, r: LogicalPlan, op: String): Unit =
    require(org.apache.spark.sql.catalyst.expressions.AttributeSet(l.output)
      .intersect(org.apache.spark.sql.catalyst.expressions
        .AttributeSet(r.output)).isEmpty,
      s"$op: sides must be attribute-disjoint (use Tables.fresh for the " +
        "right side of a self-join — the table cache shares plan instances)")

  /** Streaming cursor over a sorted row iterator with the current
    * row's key/time evaluated ONCE per advance (not per probe). The
    * expressions must already be bound to the iterator's schema. */
  final class EvalCursor(iter: Iterator[InternalRow],
                         key: Expression, time: Expression) {
    var row: InternalRow = _
    var keyV: java.lang.Long = _
    var timeV: java.lang.Long = _
    advance()
    def advance(): Unit = {
      row = if (iter.hasNext) iter.next() else null
      if (row == null) { keyV = null; timeV = null }
      else {
        keyV = key.eval(row).asInstanceOf[java.lang.Long]
        timeV = time.eval(row).asInstanceOf[java.lang.Long]
      }
    }
  }
}
