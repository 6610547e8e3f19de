package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Non-parquet source/sink paths (SURVEY §2.1 sink note: CSV/JSON are
  * exercised in unit tests since fixtures are parquet-only) and the
  * counters surface (SURVEY §1.1: MapReduce counters → df.observe /
  * accumulators).
  */
class SourcesSpec extends GraftSuite {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("CSV round-trip preserves rows and schema with explicit types") {
    import spark.implicits._
    val dir = tmp("graft_csv")
    val src = ops.Tables.t(spark, SparkTestBase.sf0001, "nation")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.orderBy($"n_nationkey").collect().toSeq ===
      src.orderBy($"n_nationkey").collect().toSeq)
  }

  test("JSON round-trip preserves rows; schema inference finds the columns") {
    import spark.implicits._
    val dir = tmp("graft_json")
    val src = ops.Tables.t(spark, SparkTestBase.sf0001, "region")
    src.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
      .select($"r_regionkey".cast("int"), $"r_name")
    assert(back.orderBy($"r_regionkey").collect().toSeq ===
      src.orderBy($"r_regionkey").collect().toSeq)
  }

  test("ORC round-trip preserves rows and schema") {
    import spark.implicits._
    val dir = tmp("graft_orc")
    val src = ops.Tables.t(spark, SparkTestBase.sf0001, "supplier")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === src.schema)
    assert(back.orderBy($"s_suppkey").collect().toSeq ===
      src.orderBy($"s_suppkey").collect().toSeq)
  }

  test("df.observe exposes counter-style metrics without a second pass") {
    import spark.implicits._
    val observed = ops.Tables.t(spark, SparkTestBase.sf0001, "lineitem")
      .observe("stats", count(lit(1)).as("rows_seen"),
        sum($"l_quantity").as("qty_total"))
    // collect() executes THIS Dataset's plan (count() would plan a
    // separate QueryExecution and the metrics would attach there)
    val n = observed.collect().length.toLong
    val metrics = observed.queryExecution.observedMetrics("stats")
    assert(metrics.getAs[Long]("rows_seen") === n)
    assert(metrics.getAs[Double]("qty_total") > 0.0)
  }

  test("accumulator counts filtered records exactly once per pass") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("bad_rows")
    val docs = ops.Tables.t(spark, SparkTestBase.microDir, "documents")
      .as[(Long, String, String, String, Long)]
    val cleaned = docs.filter { r =>
      val ok = r._2.nonEmpty
      if (!ok) acc.add(1)
      ok
    }
    assert(cleaned.count() === 3)
    assert(acc.value === 0)
  }
}
