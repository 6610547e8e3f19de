package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: warm-loop timing for named queries at a given SF dir
  * (run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.TimeQ q_x"). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        "false")
      .config("spark.sql.warehouse.dir", graft.TempWarehouse.dir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.ops.Tables.names.foreach { n =>
      try graft.ops.Tables.t(spark, d, n).count() catch { case _: Throwable => () }
    }
    args.foreach { q =>
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, d).count()
        println(f"TIME $q run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
