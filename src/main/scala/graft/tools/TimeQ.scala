package graft.tools



/** Dev tool: warm-loop timing for named queries at a given SF dir
  * (run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.TimeQ q_x"). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.builder("local[32]", "32").getOrCreate()
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
