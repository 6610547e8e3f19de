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

  /** Base DataFrames are cached per (session, dir, table): a DataFrame
    * is an immutable plan, and rebuilding it per query repeats file
    * listing + parquet schema inference — pure fixed overhead that at
    * 81 declared queries dominated the bench total (sf0.001 ≈ sf0.1).
    * The cache key includes the session so test sessions with
    * different configs never share plans. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, sfDir, name), { case (s, d, n) =>
      if (n == "events") {
        // events.ts is parquet TIMESTAMP(NANOS) which Spark 4's reader
        // rejects outright (PARQUET_TYPE_ILLEGAL). Read it as raw nanos
        // via the legacy conf, then truncate to microseconds — exactly
        // what DuckDB does when it reads the same file, so the two
        // engines agree to the microsecond.
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        import org.apache.spark.sql.functions._
        s.read.parquet(s"$d/$n.parquet")
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      } else {
        s.read.parquet(s"$d/$n.parquet")
      }
    })
}
