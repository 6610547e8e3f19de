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

  /** THE cross-engine hash of the whole differential: a 60-bit value
    * from the first 15 hex chars of md5 (in-range for signed BIGINT),
    * identical in DuckDB as `CAST('0x' || substring(md5(x), 1, 15) AS
    * BIGINT)`. Defined ONCE — every split/mix/fingerprint query uses
    * this helper (or [[h60Sql]] inside expr strings) so the formula
    * can never drift between call sites. */
  def h60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  }

  /** [[h60]] spelled as a SQL fragment, for `expr(...)` lambdas. */
  def h60Sql(x: String): String =
    s"cast(conv(substring(md5($x), 1, 15), 16, 10) as bigint)"

  /** Base DataFrames are cached per (session, dir, table): a DataFrame
    * is an immutable plan, and rebuilding it per query repeats file
    * listing + parquet schema inference — pure fixed overhead that at
    * 81 declared queries dominated the bench total (sf0.001 ≈ sf0.1).
    * The outer map is weak-keyed on the session so a stopped session's
    * plans can be GC'd (a long-lived JVM creating many short-lived
    * test sessions must not pin them all); the inner map is the plain
    * per-(dir, table) plan cache. */
  private val cache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  /** Memoize a DERIVED table (a built plan, e.g. the symmetrized trade
    * graph) per (session, dir, key) in the same weak-keyed cache as the
    * base tables. Queries that share an expensive intermediate — the
    * three graph queries all rebuild the same orders⋈lineitem distinct
    * edge list — register it here so a multi-query run (Bench, Verify,
    * DeterminismSpec) builds and persists it ONCE instead of leaving
    * one never-freed checkpoint block per query. Keys are prefixed so
    * they can't collide with base-table names. */
  def derived(spark: SparkSession, sfDir: String, key: String)
             (build: => DataFrame): DataFrame =
    perSessionMap(spark).computeIfAbsent((sfDir, "derived:" + key),
      (_: (String, String)) => build)

  private def perSessionMap(spark: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame] =
    cache.synchronized {
      var m = cache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
        cache.put(spark, m)
      }
      m
    }

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    perSessionMap(spark).computeIfAbsent((sfDir, name), { case (d, n) =>
      if (n == "events") {
        // events.ts has flipped between parquet TIMESTAMP(NANOS) and
        // TIMESTAMP(MICROS) across fixture regenerations, so detect the
        // type the reader actually produced instead of assuming either.
        // NANOS: Spark 4 rejects it outright (PARQUET_TYPE_ILLEGAL)
        // unless read as raw longs via the legacy conf, then truncated
        // to micros — exactly what DuckDB does, so the engines agree.
        // MICROS (not UTC-adjusted): arrives as TIMESTAMP_NTZ; cast to
        // session-tz TIMESTAMP (session tz is pinned to UTC, so the
        // instant is unchanged) to keep one type downstream.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.types.{LongType, TimestampNTZType}
        val raw = spark.read.parquet(s"$d/$n.parquet")
        raw.schema("ts").dataType match {
          case LongType =>
            raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case TimestampNTZType =>
            raw.withColumn("ts", col("ts").cast("timestamp"))
          case _ => raw
        }
      } else {
        spark.read.parquet(s"$d/$n.parquet")
      }
    })
  }
}
