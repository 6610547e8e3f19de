package graft

import graft.functions.FloatDot
import org.apache.spark.sql.functions._

/** The native codegen'd dot-product expression: value correctness
  * against the interpreted HOF form, null handling, SQL registration
  * via GraftExtensions, and presence in whole-stage codegen.
  */
class FloatDotSpec extends GraftSuite {

  test("float_dot equals the aggregate(zip_with(...)) HOF on fixture vectors") {
    import spark.implicits._
    val emb = ops.Tables.t(spark, SparkTestBase.sf0001, "embeddings")
    val diff = emb.select(
        FloatDot.dotF($"embedding", $"embedding").as("native"),
        aggregate(zip_with($"embedding", $"embedding",
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v).as("hof"))
      .where(abs($"native" - $"hof") > 1e-12)
    assert(diff.count() === 0, "native and HOF sums must agree exactly")
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
