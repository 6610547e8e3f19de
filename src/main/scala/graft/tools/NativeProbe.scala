package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only decomposition of a query's wall time into DataFrame BUILD
  * (driver-side plan construction, incl. Tables.fresh reads),
  * PLANNING (analysis→executedPlan), and EXECUTE (action) — used to
  * attribute the native operators' fixture-scale gap vs their
  * emulations (BUILD_NOTES round 5).
  *
  * usage: runMain graft.tools.NativeProbe <sfDir> <query> [reps]
  */
object NativeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.Tables.names.foreach { n =>
      try graft.ops.Tables.t(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      val n = df.count()
      val t3 = System.nanoTime()
      println(f"[probe] $name rep$i build ${(t1 - t0) / 1e6}%.0f ms, " +
        f"plan ${(t2 - t1) / 1e6}%.0f ms, exec ${(t3 - t2) / 1e6}%.0f ms " +
        f"($n rows)")
    }
    spark.stop()
  }
}
