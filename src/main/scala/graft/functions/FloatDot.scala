package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two `array<float>` columns,
  * accumulated in double (float→double widening is exact, SURVEY §2
  * determinism rule 5).
  *
  * This replaces the `aggregate(zip_with(...))` higher-order-function
  * form in the similarity queries: HOFs are CodegenFallback
  * (interpreted per row, one closure call per element), while this
  * expression participates in whole-stage codegen as a tight primitive
  * loop over the two `ArrayData` buffers — the preferred extension
  * path when built-ins can't express the hot inner loop efficiently.
  *
  * Two null disciplines:
  *  - `strict = false` (the `float_dot` SQL function): null elements
  *    contribute 0 and length mismatch truncates to the shorter side.
  *  - `strict = true` (planted by [[graft.plans.DotKernelRule]]): the
  *    result is NULL on any null element or length mismatch — exactly
  *    the `aggregate(zip_with(a,b,(x,y)->x*y), 0D, +)` semantics
  *    (zip_with pads the shorter side with null, the null product
  *    poisons the fold), so the optimizer rewrite never changes a
  *    query's result.
  */
case class FloatDot(left: Expression, right: Expression,
    strict: Boolean = false)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got $l and $r")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean =
    strict || left.nullable || right.nullable

  override def prettyName: String = "float_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (strict && x.numElements() != y.numElements()) return null
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      } else if (strict) {
        return null
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      if (!strict) {
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
           |    $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
           |  }
           |}
           |${ev.value} = $s;
         """.stripMargin
      } else {
        // nullable is true in strict mode, so ev.isNull is assignable.
        s"""
           |if ($x.numElements() != $y.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $n = $x.numElements();
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($x.isNullAt($i) || $y.isNullAt($i)) {
           |      ${ev.isNull} = true;
           |      break;
           |    }
           |    $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
           |  }
           |  ${ev.value} = $s;
           |}
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

object FloatDot {
  /** Column-API entry point. Resolves through the `float_dot` function
    * GraftExtensions registers (every engine session installs it);
    * takes column NAMES because the public Column API offers no direct
    * Expression→Column bridge. */
  def dotF(a: String, b: String): Column = expr(s"float_dot($a, $b)")

  def dotF(a: Column, b: Column): Column = {
    // toString of a plain attribute Column is its name; computed
    // columns must use the String overload.
    dotF(a.toString, b.toString)
  }
}
