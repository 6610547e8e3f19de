package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan dumper: prints the executed plan of named queries so
  * plan-shape iteration doesn't need a test cycle. Not part of the
  * driver contract.
  *
  * usage: runMain graft.tools.Explain <sfDir> <queryName> [more...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        "false")
      // Table-backed queries (bucketed joins, the ANN serve index)
      // must not leave a spark-warehouse/ in the repo working tree.
      .config("spark.sql.warehouse.dir", graft.TempWarehouse.dir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      println(s"=== $name ===")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
