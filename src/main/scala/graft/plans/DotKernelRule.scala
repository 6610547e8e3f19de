package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.FloatDot

/** Optimizer rule: rewrite the declarative dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS
  *   DOUBLE)), 0D, (acc, v) -> acc + v)
  *
  * over `array<float>` columns into the codegen'd [[FloatDot]] kernel.
  * Higher-order functions evaluate interpreted (CodegenFallback, one
  * closure call per element); the kernel is a primitive loop inside
  * whole-stage codegen — so users can write the portable declarative
  * form and still get kernel performance, the same way an engine
  * rewrites `count(distinct)` or strength-reduces expressions.
  *
  * Soundness: the kernel is planted in STRICT mode, which returns NULL
  * on length mismatch or any null element — bit-for-bit the HOF
  * semantics (zip_with pads the shorter side with null and the null
  * product poisons the fold; accumulation order is the same
  * left-to-right double sum). The rewrite therefore never changes a
  * result, regardless of element nullability or ragged inputs.
  */
object DotKernelRule extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** The element access inside the lambda: the variable itself or its
    * widening cast to double. */
  private def asVar(e: Expression): Option[ExprId] = e match {
    case v: NamedLambdaVariable => Some(v.exprId)
    case c: Cast if c.dataType == DoubleType => asVar(c.child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(m: Multiply,
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero @ Literal(0.0, DoubleType),
            LambdaFunction(a: Add,
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(fv: NamedLambdaVariable), _))
          if isFloatArray(l) && isFloatArray(r) &&
            // the multiply must be a DOUBLE multiply (both operands
            // cast-widened BEFORE multiplying — FloatDot's arithmetic).
            // A bare float multiply (x, y) -> x * y rounds each
            // product to float first and can overflow to Infinity; it
            // must NOT match, or the rewrite changes results.
            m.dataType == DoubleType &&
            // +0.0 only: a -0.0 seed is observable (1/x sign) and
            // Scala constant patterns equate -0.0 == 0.0.
            java.lang.Double.doubleToRawLongBits(
              zero.value.asInstanceOf[Double]) == 0L &&
            // product of exactly the two zip variables, either order
            (Set(asVar(m.left), asVar(m.right)).flatten
              == Set(x.exprId, y.exprId)) &&
            // fold is acc + v (addition commutes in IEEE)
            (Set(asVar(a.left), asVar(a.right)).flatten
              == Set(acc.exprId, v.exprId)) &&
            // identity finish
            fin.exprId == fv.exprId =>
        FloatDot(l, r, strict = true)
    }
}
