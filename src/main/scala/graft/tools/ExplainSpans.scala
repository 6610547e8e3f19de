package graft.tools

/** Dev-only plan dumper for the substrExactSpans DERIVED memo: the
  * declared q_dedup_substr_cut/_exact plans show only `Scan
  * ExistingRDD` past the memo's lazy localCheckpoint boundary, so
  * plan-shape iteration on the span detection itself needs the memo's
  * own plan. Not part of the driver contract.
  *
  * usage: runMain graft.tools.ExplainSpans <sfDir>
  */
object ExplainSpans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.EngineSession.builder("local[4]", "4")
      .config("spark.graft.explainNoCk", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("=== substrExactSpans memo ===")
    graft.ops.ExtOps.substrExactSpans(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
