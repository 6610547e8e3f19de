package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BoundReference, Cast, Expression, RowOrdering, UnixMicros,
  UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType,
  LongType, ShortType, StringType, StructType, TimestampNTZType,
  TimestampType}

/** Shared plumbing for the native merge operators (AsofJoin,
  * RangeJoin, Sessionize): column resolution with clear driver-side
  * errors, time normalization to long microseconds, and the
  * specialized readers/comparators their streaming merges share.
  *
  * Validation lives HERE (in the public apply helpers), never in the
  * logical nodes' constructors: Catalyst re-runs constructors during
  * canonicalization with exprIds renumbered from zero, where any
  * constructor-time invariant over child outputs is spuriously
  * violated (a body require fired on every cache lookup once any
  * DataFrame was cached).
  *
  * The hot-path machinery ([[LongReader]], [[MergeKeys]], [[RowBuffer]])
  * exists because the execs run outside WholeStageCodegen: an
  * interpreted `Expression.eval` per row boxes every long and a
  * `row.copy()` per remembered row allocates per advance — measured as
  * the gap that made the native as-of slower than its window emulation.
  * The readers resolve the common column shapes down to primitive
  * `getLong` calls once per partition, and the buffer turns retained
  * copies into a reused memcpy.
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

  /** A merge key must have a total order (SortOrder plans it, the
    * merge compares it). Matching left/right types are checked at the
    * operator level where both sides are in hand. */
  def requireOrderable(at: Attribute, op: String): Unit =
    require(RowOrdering.isOrderable(at.dataType),
      s"$op: column '${at.name}' has no total order " +
        s"(${at.dataType.sql}) — cast it to an orderable type first")

  def requireDisjoint(l: LogicalPlan, r: LogicalPlan, op: String): Unit =
    require(org.apache.spark.sql.catalyst.expressions.AttributeSet(l.output)
      .intersect(org.apache.spark.sql.catalyst.expressions
        .AttributeSet(r.output)).isEmpty,
      s"$op: sides must be attribute-disjoint (use Tables.fresh for the " +
        "right side of a self-join — the table cache shares plan instances)")

  /** True when `dt` is stored as a primitive integral the merge can
    * compare with `Long.compare` — the fast path for keys. */
  def isIntegral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Code fragments for a native-merge key inside WholeStageCodegen.
    * Integral keys live in one primitive `long` of generated-class
    * state; default-collation strings in a `UTF8String` field whose
    * `compareTo` is the SAME binary order SortOrder plans (collated
    * strings sort differently and stay on the interpreted path). The
    * `save` fragment owns the value across cursor advances — a
    * UTF8String from a child iterator is a view into a reused row
    * buffer, so saving clones it (mirrors GenericMergeKeys'
    * copyValue); current-cursor loads stay zero-copy.
    */
  final case class KeyCodegen(
      javaType: String, defaultValue: String,
      load: String => String,
      cmp: (String, String) => String,
      eq: (String, String) => String,
      save: String => String)

  /** The codegen fragments for key type `dt`, or None when only the
    * interpreted merge supports it (the execs' `supportCodegen`). */
  def keyCodegen(dt: DataType): Option[KeyCodegen] = dt match {
    case _ if isIntegral(dt) => Some(KeyCodegen(
      "long", "0L", v => s"(long)($v)",
      (a, b) => s"java.lang.Long.compare($a, $b)",
      (a, b) => s"$a == $b", v => v))
    case st: StringType if st == StringType => Some(KeyCodegen(
      "UTF8String", "null", v => v,
      (a, b) => s"$a.compareTo($b)",
      (a, b) => s"$a.equals($b)", v => s"$v.clone()"))
    // COMPOSITE keys: a struct of integral / default-collation string
    // fields — the multi-column id shape ((user_id, device_id) session
    // keys) packed into one column via struct(...). The struct value
    // is an InternalRow in generated code; cmp/eq expand to field-wise
    // fragments over the primitive accessors, with the same
    // nulls-first-per-field order SortOrder plans for structs, so the
    // merge compares exactly what the sort sorted. The loaded value is
    // a view into the child's reused row buffer (like UTF8String) —
    // save owns it via copy(). cmp's ternary chain re-evaluates a
    // field's compare when it decides (≤2 evals/field, allocation-
    // free); nested structs and other field types stay interpreted.
    case st: StructType if st.fields.nonEmpty && st.fields.forall { f =>
        isIntegral(f.dataType) || (f.dataType match {
          case s: StringType => s == StringType
          case _ => false
        })
      } =>
      // Field accessor widened to long for the integral shapes.
      def prim(row: String, i: Int): String = st.fields(i).dataType match {
        case LongType | TimestampType | TimestampNTZType => s"$row.getLong($i)"
        case IntegerType | DateType => s"(long) $row.getInt($i)"
        case ShortType => s"(long) $row.getShort($i)"
        case ByteType => s"(long) $row.getByte($i)"
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      def fEq(a: String, b: String, i: Int): String = {
        val v = st.fields(i).dataType match {
          case _: StringType =>
            s"$a.getUTF8String($i).equals($b.getUTF8String($i))"
          case _ => s"${prim(a, i)} == ${prim(b, i)}"
        }
        s"($a.isNullAt($i) ? $b.isNullAt($i) : (!$b.isNullAt($i) && $v))"
      }
      def fCmp(a: String, b: String, i: Int): String = {
        val v = st.fields(i).dataType match {
          case _: StringType =>
            s"$a.getUTF8String($i).compareTo($b.getUTF8String($i))"
          case _ => s"java.lang.Long.compare(${prim(a, i)}, ${prim(b, i)})"
        }
        s"($a.isNullAt($i) ? ($b.isNullAt($i) ? 0 : -1) : " +
          s"($b.isNullAt($i) ? 1 : $v))"
      }
      val n = st.fields.length
      Some(KeyCodegen(
        "InternalRow", "null", v => v,
        (a, b) => (0 until n).foldRight("0") { (i, rest) =>
          s"(${fCmp(a, b, i)} != 0 ? ${fCmp(a, b, i)} : $rest)"
        },
        (a, b) => (0 until n).map(fEq(a, b, _)).mkString("(", " && ", ")"),
        v => s"((InternalRow) $v.copy())"))
    case _ => None
  }

  /** Single-value reader for a bound long-valued expression: `read`
    * returns whether the value is NULL and leaves the primitive in
    * `value` — zero boxing. The common shapes (a direct integral /
    * timestamp column; `unix_micros` over a timestamp column, which is
    * the identity on the stored micros; the NTZ variant under the
    * pinned-UTC cast) resolve to direct `getLong`-class accessors;
    * anything else falls back to one interpreted eval per read. */
  abstract class LongReader {
    var value: Long = 0L
    /** Evaluate against `r`; true iff NULL (then `value` is garbage). */
    def read(r: InternalRow): Boolean
  }

  def longReader(bound: Expression): LongReader = bound match {
    case b: BoundReference if b.dataType == LongType ||
        b.dataType == TimestampType || b.dataType == TimestampNTZType =>
      new LongReader {
        private val o = b.ordinal
        def read(r: InternalRow): Boolean =
          if (r.isNullAt(o)) true else { value = r.getLong(o); false }
      }
    case b: BoundReference if b.dataType == IntegerType ||
        b.dataType == DateType =>
      new LongReader {
        private val o = b.ordinal
        def read(r: InternalRow): Boolean =
          if (r.isNullAt(o)) true else { value = r.getInt(o).toLong; false }
      }
    case b: BoundReference if b.dataType == ShortType =>
      new LongReader {
        private val o = b.ordinal
        def read(r: InternalRow): Boolean =
          if (r.isNullAt(o)) true else { value = r.getShort(o).toLong; false }
      }
    case b: BoundReference if b.dataType == ByteType =>
      new LongReader {
        private val o = b.ordinal
        def read(r: InternalRow): Boolean =
          if (r.isNullAt(o)) true else { value = r.getByte(o).toLong; false }
      }
    // unix_micros(ts): timestamps store epoch micros, so this is the
    // stored long itself.
    case UnixMicros(b: BoundReference) if b.dataType == TimestampType =>
      new LongReader {
        private val o = b.ordinal
        def read(r: InternalRow): Boolean =
          if (r.isNullAt(o)) true else { value = r.getLong(o); false }
      }
    // unix_micros(cast(ntz as timestamp)) under a UTC zone id: the
    // cast is instant-preserving, so again the stored long. Any other
    // zone falls through to the interpreted path below.
    case UnixMicros(c @ Cast(b: BoundReference, TimestampType, _, _))
        if b.dataType == TimestampNTZType &&
          c.timeZoneId.exists(z => z == "UTC" || z == "Etc/UTC" || z == "Z") =>
      new LongReader {
        private val o = b.ordinal
        def read(r: InternalRow): Boolean =
          if (r.isNullAt(o)) true else { value = r.getLong(o); false }
      }
    case e =>
      new LongReader {
        def read(r: InternalRow): Boolean = {
          val v = e.eval(r)
          if (v == null) true
          else { value = v.asInstanceOf[java.lang.Number].longValue(); false }
        }
      }
  }

  /** Key state for a two-sided streaming merge: the current left key,
    * the current right key, and one saved key (the remembered match in
    * the as-of join; the buffered-band owner in the range join). One
    * instance per partition; integral keys compare primitively, any
    * other orderable type through its interpreted ordering. Current
    * keys are only valid until the next `set` on that side — only the
    * saved slot survives cursor advances (and is deep-copied in the
    * generic case, where eval returns views into reused row buffers). */
  abstract class MergeKeys {
    /** Read the left/right key from `r`; true iff NULL. */
    def setLeft(r: InternalRow): Boolean
    def setRight(r: InternalRow): Boolean
    /** sign(right - left) over the current keys (neither NULL). */
    def cmpRightLeft(): Int
    def saveLeft(): Unit
    def saveRight(): Unit
    /** True iff a key was saved and it equals the current left key. */
    def savedEqualsLeft(): Boolean
  }

  private final class LongMergeKeys(lKey: LongReader, rKey: LongReader)
      extends MergeKeys {
    private var lk = 0L
    private var rk = 0L
    private var saved = 0L
    private var hasSaved = false
    def setLeft(r: InternalRow): Boolean = {
      val n = lKey.read(r); lk = lKey.value; n
    }
    def setRight(r: InternalRow): Boolean = {
      val n = rKey.read(r); rk = rKey.value; n
    }
    def cmpRightLeft(): Int = java.lang.Long.compare(rk, lk)
    def saveLeft(): Unit = { saved = lk; hasSaved = true }
    def saveRight(): Unit = { saved = rk; hasSaved = true }
    def savedEqualsLeft(): Boolean = hasSaved && saved == lk
  }

  private final class GenericMergeKeys(
      lKey: Expression, rKey: Expression, ord: Ordering[Any])
      extends MergeKeys {
    private var lk: Any = null
    private var rk: Any = null
    private var saved: Any = null
    private var hasSaved = false
    def setLeft(r: InternalRow): Boolean = { lk = lKey.eval(r); lk == null }
    def setRight(r: InternalRow): Boolean = { rk = rKey.eval(r); rk == null }
    def cmpRightLeft(): Int = ord.compare(rk, lk)
    // eval over an UnsafeRow returns views into the row's buffer
    // (UTF8String, arrays) — the saved slot must own its bytes.
    def saveLeft(): Unit = { saved = InternalRow.copyValue(lk); hasSaved = true }
    def saveRight(): Unit = { saved = InternalRow.copyValue(rk); hasSaved = true }
    def savedEqualsLeft(): Boolean = hasSaved && ord.equiv(saved, lk)
  }

  /** Build the partition-local key comparator for bound key
    * expressions of (identical) type `dt`. */
  def mergeKeys(dt: DataType, lBound: Expression, rBound: Expression)
      : MergeKeys =
    if (isIntegral(dt)) new LongMergeKeys(longReader(lBound), longReader(rBound))
    else new GenericMergeKeys(lBound, rBound,
      TypeUtils.getInterpretedOrdering(dt))

  /** Retain a row across iterator advances without per-row allocation:
    * UnsafeRows (what sorted children emit) are memcpy'd into one
    * reused backing buffer; anything else falls back to `copy()`. The
    * returned row is only valid until the next `set`. */
  final class RowBuffer {
    private var buf: UnsafeRow = _
    def set(row: InternalRow): InternalRow = row match {
      case u: UnsafeRow =>
        if (buf == null) buf = u.copy() else buf.copyFrom(u)
        buf
      case other => other.copy()
    }
  }
}
