package graft.tools



/** Dev-only plan dumper: prints the executed plan of named queries so
  * plan-shape iteration doesn't need a test cycle. Not part of the
  * driver contract.
  *
  * usage: runMain graft.tools.Explain <sfDir> <queryName> [more...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val b = graft.EngineSession.builder("local[4]", "4")
    // GRAFT_EXPLAIN_NOCK=true: print THROUGH lazy-checkpoint
    // boundaries (the ExplainSpans knob, generalized) — for plan
    // evidence on logic that lives inside a ck'd memo. Dev-only;
    // never set by a measured or verified runner.
    if (sys.env.get("GRAFT_EXPLAIN_NOCK").contains("true"))
      b.config("spark.graft.explainNoCk", "true")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      println(s"=== $name ===")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
