package graft.tools



/** Dev tool: dump join/exchange operator counts for named queries —
  * the .explain feedback loop the build process uses to keep plans
  * broadcast-shaped (run: sbt "runMain graft.tools.PlanDump q_x q_y").
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val p = graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString
      def c(s: String) = s.r.findAllIn(p).length
      println(s"PLAN $n bhj=${c("BroadcastHashJoin")} smj=${c("SortMergeJoin")}" +
        s" exch=${c("Exchange hashpartitioning")} cart=${c("CartesianProduct")}" +
        s" bnlj=${c("BroadcastNestedLoopJoin")} win=${c("Window")}")
    }
    spark.stop()
  }
}
