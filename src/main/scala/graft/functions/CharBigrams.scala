package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Per-document character-bigram counting kernel for the LM-scoring
  * operator (q_text_charlm).
  *
  * The composable form — `explode(transform(sequence(1, length(t)-1),
  * i -> substring(t, i, 2)))` followed by a count aggregate — walks an
  * interpreted HOF, materializes one row PER CHARACTER, and leans on
  * the hash aggregate to collapse them again. This kernel emits the
  * collapsed per-doc counts directly (one JVM pass per document, one
  * output row per DISTINCT bigram), so the downstream plan starts at
  * ~|distinct bigrams per doc| rows instead of |chars|.
  *
  * Bigrams are UTF-16 unit pairs, which equal codepoint pairs for BMP
  * text (the corpus is verified astral-free; DuckDB's `substring`
  * counts codepoints, so non-BMP input would diverge — documented
  * limitation, same as every `length`-based operator here). Output is
  * sorted by bigram for a deterministic row order under explode.
  */
object CharBigrams {
  def bigramCounts(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val m = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < n - 1) {
      m.merge(str.substring(i, i + 2), 1L,
        (a: java.lang.Long, b: java.lang.Long) => a + b)
      i += 1
    }
    val keys = m.keySet().toArray(new Array[String](0))
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]])
    new GenericArrayData(keys.map(k =>
      InternalRow(UTF8String.fromString(k), m.get(k).longValue()): Any))
  }
}

/** `char_bigram_counts(t string)` → sorted
  * `array<struct<bg: string, c: bigint>>` of distinct character
  * bigrams with multiplicities. */
case class CharBigramCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("bg", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "char_bigram_counts"

  override def nullSafeEval(s: Any): Any =
    CharBigrams.bigramCounts(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CharBigrams.bigramCounts($s);")

  override protected def withNewChildInternal(
      newChild: Expression): CharBigramCounts = copy(child = newChild)
}
