package graft

import org.apache.spark.sql.SparkSession

/** THE graft engine session posture, defined once.
  *
  * Every runner that executes declared queries (Bench, Verify, the
  * dev tools, the test session) must carry the same
  * execution-affecting confs, or a query can silently change access
  * path between runners — the round-13 lesson: q_text_bm25_serve's
  * bucket-pruned postings scan depends on
  * `autoBucketedScan.enabled=false`, and a runner that forgot the
  * flag degraded to a full postings scan with no error anywhere
  * (perf-only, caught only by PlanShapeSpec in the test session).
  * Copy-pasting the conf block into each main is exactly how a new
  * entry point drops one line; this builder is the single source.
  *
  * The posture:
  *  - `spark.sql.shuffle.partitions` = the runner's parallelism (32
  *    for measured runs — never the 200 default, which at local[32]
  *    just multiplies task-scheduling overhead);
  *  - UTC session timezone (the fixtures' TIMESTAMP_NTZ columns must
  *    mean the same instant in both engines);
  *  - `graft.GraftExtensions` (the native operator strategies);
  *  - parquet aggregate pushdown (unfiltered count/min/max answered
  *    from footers — Spark only rewrites when exact);
  *  - `autoBucketedScan.enabled=false` (bucketed tables are read AS
  *    bucketed even when no join needs the distribution, keeping
  *    BUCKET PRUNING available — the inverted-index access path);
  *  - a per-JVM temp warehouse (table-writing queries must never
  *    leave `spark-warehouse/` in the repo tree — [[TempWarehouse]]).
  */
object EngineSession {
  def builder(master: String, shufflePartitions: String)
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        "false")
      .config("spark.sql.warehouse.dir", TempWarehouse.dir())
}
