package graft.tools

/** Dev tool: ssspDist regime A/B at the bench fixture — broadcast
  * distance table vs SHUFFLE_HASH keyed relaxation — plus a result
  * equality check, backing the regime-split claim in the ssspDist
  * scaladoc with measurements (the BfsScale pattern). Run:
  * SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.SsspScale". */
object SsspScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.ops.Tables.t(spark, d, "orders").count()
    graft.ops.Tables.t(spark, d, "lineitem").count()
    // Split the weighted-edge memo build from the relaxation itself.
    val tb0 = System.nanoTime()
    graft.ops.GraphOps.tradeEdgesWgt(spark, d).count()
    graft.ops.GraphOps.tradeDeg(spark, d).count()
    println(f"SSSPSCALE weighted-edge build: ${(System.nanoTime() - tb0) / 1e9}%.2f s")
    val seed = graft.ops.GraphOps.tradeDeg(spark, d)
      .select($"src".as("node"), $"d".as("dg"))
      .orderBy($"dg".desc, $"node").limit(1).select($"node")
    var results = Map.empty[Boolean, Set[(String, Long)]]
    Seq(true, false).foreach { bc =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val r = graft.ops.GraphOps.ssspDist(
          graft.ops.GraphOps.tradeEdgesWgt(spark, d), seed,
          graft.ops.GraphOps.SsspRounds, broadcastDist = bc)
        results += bc -> r.collect()
          .map(x => (x.getString(0), x.getLong(1))).toSet
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SSSPSCALE broadcast=$bc%-5s min=${times.min}%.2f s " +
        f"runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    println(s"SSSPSCALE strategies agree: ${results(true) == results(false)}" +
      s" (${results(true).size} reached nodes)")
    // The frontier-delta claim, measured: per-round |frontier| vs
    // |reached| — late-round relax-join input must SHRINK while the
    // reached set saturates (r14 verdict task 4).
    graft.ops.GraphOps.ssspFrontierSizes(
        graft.ops.GraphOps.tradeEdgesWgt(spark, d), seed,
        graft.ops.GraphOps.SsspRounds)
      .foreach { case (i, f, r) =>
        println(s"SSSPSCALE round $i: frontier=$f reached=$r")
      }
    spark.stop()
  }
}
