package graft.tools



/** Dev-only micro-profiler: times one named query N times (after a
  * table warm-up) so plan-vs-data costs are separable. Not part of the
  * driver contract.
  *
  * usage: runMain graft.tools.Profile <sfDir> <queryName> [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineSession.builder(s"local[$cpus]", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.Tables.names.foreach { n =>
      try graft.ops.Tables.t(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[profile] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
