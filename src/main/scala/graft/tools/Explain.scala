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
    val spark = graft.EngineSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      println(s"=== $name ===")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
