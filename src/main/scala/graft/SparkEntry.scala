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
      (Aggs.queries, Aggs.oracle),
    )

  /** Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
