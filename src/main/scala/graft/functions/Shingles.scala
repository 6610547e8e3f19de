package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Native shingling/minhash kernels for the dedup operators.
  *
  * The composable form — `array_distinct(transform(sequence(...),
  * i -> xxhash64(concat_ws(...))))` — is correct but slow: higher-order
  * functions are CodegenFallback (interpreted, one closure dispatch +
  * UTF8String concat allocation per shingle), and the minhash
  * signature repeats that interpreted pass once per band. Profiled at
  * sf0.1 that was ~1.5 s per pass with the pass repeated for every
  * self-join side. These expressions do the same work as tight
  * primitive loops inside whole-stage codegen; the hash family differs
  * from xxhash64-of-concat but dedup semantics only need set identity
  * (the DuckDB oracles shingle raw strings, not hashes).
  */
object Shingles {
  /** Golden-ratio odd constant (0x9E3779B97F4A7C15) for the n-gram
    * polynomial combine of per-word hashes. */
  final val GoldenGamma: Long = -7046029254386353131L

  /** Distinct 64-bit hashes of the n-word shingles of `words`,
    * sorted ascending. One XXH64 per word, one multiply-add per
    * (shingle, word), then sort+dedup — no string concatenation. */
  def shingles(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    val m = len - (n - 1)
    if (n <= 0 || m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val wh = new Array[Long](len)
    var i = 0
    while (i < len) {
      val w = if (words.isNullAt(i)) null else words.getUTF8String(i)
      wh(i) =
        if (w == null) 0L
        else XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, 42L)
      i += 1
    }
    val sh = new Array[Long](m)
    i = 0
    while (i < m) {
      var s = wh(i)
      var k = 1
      while (k < n) { s = s * GoldenGamma + wh(i + k); k += 1 }
      sh(i) = s
      i += 1
    }
    java.util.Arrays.sort(sh)
    var u = 0
    i = 0
    while (i < m) {
      if (i == 0 || sh(i) != sh(i - 1)) { sh(u) = sh(i); u += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(sh, u))
  }

  /** Intersection size of two SORTED, DISTINCT long arrays (the shape
    * `shingle_hash` emits) by linear merge — no per-call hash-set
    * allocation like `array_intersect`, and no intermediate array since
    * the dedup verifies only need the count. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** MinHash signature: for band b, min over `hashes` of
    * XXH64(hash, seed=42+b). Empty input → empty array (callers treat
    * the doc as candidate-less rather than colliding all empties on a
    * MaxValue signature). All bands in ONE pass over the tokens. */
  def minhashSig(hashes: ArrayData, bands: Int): ArrayData = {
    val n = hashes.numElements()
    if (bands <= 0 || n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val mins = new Array[Long](bands)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val t = hashes.getLong(i)
      var b = 0
      while (b < bands) {
        val v = XXH64.hashLong(t, 42L + b)
        if (v < mins(b)) mins(b) = v
        b += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** `shingle_hash(words array<string>, n int)` → sorted distinct
  * `array<bigint>` of 64-bit n-gram shingle hashes. */
case class ShingleHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int), got $l and $r")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash"

  override def nullSafeEval(words: Any, n: Any): Any =
    Shingles.shingles(words.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, n) =>
      s"${ev.value} = graft.functions.Shingles.shingles($w, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHash =
    copy(left = newLeft, right = newRight)
}

/** `sorted_intersect_count(a array<bigint>, b array<bigint>)` → `int`:
  * |a ∩ b| for sorted distinct inputs. Callers must pass arrays in the
  * `shingle_hash` shape; unsorted input silently undercounts. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got $l and $r")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    Shingles.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Shingles.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** `minhash_sig(hashes array<bigint>, bands int)` → `array<bigint>`
  * of per-band minima (the r=1 MinHash signature). */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, int), got $l and $r")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(hashes: Any, bands: Any): Any =
    Shingles.minhashSig(hashes.asInstanceOf[ArrayData], bands.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, b) =>
      s"${ev.value} = graft.functions.Shingles.minhashSig($h, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)
}
