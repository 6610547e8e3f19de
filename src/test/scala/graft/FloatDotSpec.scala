package graft

import graft.functions.FloatDot
import org.apache.spark.sql.functions._

/** The native codegen'd dot-product expression: value correctness
  * against the interpreted HOF form, null handling, SQL registration
  * via GraftExtensions, and presence in whole-stage codegen.
  */
class FloatDotSpec extends GraftSuite {

  private val RuleName = "graft.plans.DotKernelRule"

  /** The declarative dot-product idiom DotKernelRule targets. */
  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def withRuleExcluded[T](body: => T): T = {
    spark.conf.set("spark.sql.optimizer.excludedRules", RuleName)
    try body
    finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("float_dot equals the aggregate(zip_with(...)) HOF on fixture vectors") {
    import spark.implicits._
    val emb = ops.Tables.t(spark, SparkTestBase.sf0001, "embeddings")
    // exclude the rewrite rule so the HOF arm stays genuinely interpreted
    withRuleExcluded {
      val diff = emb.select(
          FloatDot.dotF($"embedding", $"embedding").as("native"),
          hofDot($"embedding", $"embedding").as("hof"))
        .where(abs($"native" - $"hof") > 1e-12)
      assert(diff.count() === 0, "native and HOF sums must agree exactly")
    }
  }

  test("DotKernelRule plants the strict kernel for the declarative HOF form") {
    import spark.implicits._
    val emb = ops.Tables.t(spark, SparkTestBase.sf0001, "embeddings")
    val rewritten = emb.select($"vec_id",
      hofDot($"embedding", $"embedding").as("d"))
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(plan.contains("float_dot"), s"rule must plant the kernel:\n$plan")
    // identical results with and without the rewrite, on real vectors
    val got = rewritten.orderBy($"vec_id").collect().map(_.getDouble(1))
    val want = withRuleExcluded {
      emb.select($"vec_id", hofDot($"embedding", $"embedding").as("d"))
        .orderBy($"vec_id").collect().map(_.getDouble(1))
    }
    assert(got === want, "rewrite must be value-identical (same fold order)")
  }

  test("DotKernelRule does NOT match a bare FLOAT multiply (different rounding)") {
    import spark.implicits._
    // (x, y) -> x * y without casts multiplies in FLOAT (each product
    // rounded to float, can overflow to Infinity) — semantically
    // different from the kernel's double multiply, so the rule must
    // leave it alone. 3e38f * 3e38f overflows float -> Infinity.
    val df = Seq((1L, Seq(3e38f), Seq(3e38f))).toDF("id", "a", "b")
      .select(aggregate(zip_with($"a", $"b", (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!df.queryExecution.executedPlan.toString.contains("float_dot"),
      "un-cast float multiply must not be rewritten")
    assert(df.head.getDouble(0).isPosInfinity,
      "float-multiply overflow semantics must be preserved")
  }

  test("strict kernel preserves HOF null semantics on ragged inputs") {
    import spark.implicits._
    val df = Seq(
        (1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)), // aligned → 11.0
        (2L, Seq(1.0f, 2.0f), Seq(3.0f)))       // ragged  → NULL
      .toDF("id", "a", "b")
      // keep the expression out of ConvertToLocalRelation's eager
      // evaluation so the executed plan actually shows the kernel
      .repartition(2)
      .select($"id", hofDot($"a", $"b").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("float_dot"), "rule must fire on ragged-capable input")
    val rows = df.orderBy($"id").collect()
    assert(rows(0).getDouble(1) === 11.0)
    assert(rows(1).isNullAt(1), "length mismatch must stay NULL, as the HOF")
  }

  test("float_dot skips null elements and nulls out on null arrays") {
    import spark.implicits._
    val df = Seq(
        (Some(Seq(Some(1.0f), None, Some(2.0f))), Some(Seq(Some(3.0f), Some(4.0f), Some(5.0f)))),
        (None, Some(Seq(Some(1.0f)))))
      .toDF("a", "b")
      .select(FloatDot.dotF(col("a"), col("b")).as("d"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) === 13.0) // 1*3 + skip + 2*5
    assert(rows(1).isNullAt(0))
  }

  test("float_dot is registered for SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d").collect()
    assert(r(0).getDouble(0) === 4.0)
  }

  test("q_sim_cosine_topk stays inside whole-stage codegen (no CodegenFallback HOF)") {
    val plan = q("q_sim_cosine_topk", SparkTestBase.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("float_dot"))
    assert(!plan.contains("aggregate(zip_with"),
      "similarity hot loop must use the native expression")
  }
}
