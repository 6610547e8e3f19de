package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §2 (the operator
  * inventory) and §7 (build plan). Each ops module contributes its
  * `queries` and `oracle` maps; names match SURVEY §2 rows exactly.
  */
object SparkEntry {
  private val modules: Seq[(Map[String, Tables.Q], Map[String, String])] =
    Seq(
      (Scans.queries, Scans.oracle),
      (Exprs.queries, Exprs.oracle),
      (Joins.queries, Joins.oracle),
      (Windows.queries, Windows.oracle),
      (SetOps.queries, SetOps.oracle),
      (Aggs.queries, Aggs.oracle),
      (Streamy.queries, Streamy.oracle),
      (TextOps.queries, TextOps.oracle),
      (SimOps.queries, SimOps.oracle),
      (ExtOps.queries, ExtOps.oracle),
      (PipeOps.queries, PipeOps.oracle),
      (SubOps.queries, SubOps.oracle),
      (GraphOps.queries, GraphOps.oracle),
      (LayoutOps.queries, LayoutOps.oracle),
    )

  /** Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001;
    * driver smoke-checks rows>0. Fixture dir overridable via env so a
    * relocated test-data mount doesn't break the smoke gate. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_group")(spark,
      sys.env.getOrElse("GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2.
    * Key uniqueness asserted: a duplicate name across ops modules would
    * otherwise silently shadow a query (and its oracle). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val merged = modules.iterator.flatMap(_._1).toMap
    require(merged.size == modules.map(_._1.size).sum,
      "duplicate query name across ops modules")
    merged
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    val merged = modules.iterator.flatMap(_._2).toMap
    require(merged.size == modules.map(_._2.size).sum,
      "duplicate oracle name across ops modules")
    merged
  }
}
