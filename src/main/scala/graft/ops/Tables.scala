package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table readers (SURVEY §1.2; schemas measured in FIXTURES.md).
  *
  * Every query in the engine reads its inputs through [[t]] so that the
  * scan path is uniform: parquet, columnar, vectorized, with Catalyst
  * free to push filters/projections down to the reader. At cluster
  * scale the same call sites work unchanged against an object-store
  * path — nothing here assumes local files.
  */
object Tables {
  /** The uniform signature of every declared query (SparkEntry contract). */
  type Q = (SparkSession, String) => DataFrame

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark 4's reader
      // rejects outright (PARQUET_TYPE_ILLEGAL). Read it as raw nanos
      // via the legacy conf, then truncate to microseconds — exactly
      // what DuckDB does when it reads the same file, so the two
      // engines agree to the microsecond.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
