package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: bfsFrontiers regime A/B at the bench fixture — broadcast
  * frontier/visited sets vs SHUFFLE_HASH keyed joins. Run:
  * SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.BfsScale". */
object BfsScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.ops.Tables.t(spark, d, "orders").count()
    graft.ops.Tables.t(spark, d, "lineitem").count()
    // Split the family-shared edge build from the BFS itself.
    val tb0 = System.nanoTime()
    graft.ops.GraphOps.tradeEdges(spark, d).count()
    graft.ops.GraphOps.tradeDeg(spark, d).count()
    println(f"BFSSCALE edge+deg build (family-shared): ${(System.nanoTime() - tb0) / 1e9}%.2f s")
    Seq(true, false).foreach { bc =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val edges = graft.ops.GraphOps.tradeEdges(spark, d)
        val seed = graft.ops.GraphOps.tradeDeg(spark, d)
          .select($"src".as("node"), $"d".as("dg"))
          .orderBy($"dg".desc, $"node").limit(1).select($"node")
        graft.ops.GraphOps.bfsFrontiers(edges, seed, 3, broadcastSets = bc)
          .count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BFSSCALE broadcast=$bc%-5s min=${times.min}%.2f s runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
