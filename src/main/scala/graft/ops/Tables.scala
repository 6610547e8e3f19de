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

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
