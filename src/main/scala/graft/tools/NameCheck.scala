package graft.tools

/** Dev tool: the session-end name-set recount as one command —
  * SparkEntry.queries must equal SURVEY.md §2's row set exactly
  * (the 1:1:1 invariant), and the no-oracle set must stay the five
  * declared sketch/streaming rows. Exits nonzero on any drift.
  * Run: sbt "runMain graft.tools.NameCheck". */
object NameCheck {
  def main(args: Array[String]): Unit = {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    val survey = scala.io.Source.fromFile("SURVEY.md", "UTF-8").getLines()
      .filter(_.startsWith("| `q_"))
      .map(l => l.drop(3).takeWhile(_ != '`')).toSet
    val noOracle = qs -- os
    val expectNoOracle = Set("q_agg_approx", "q_agg_hll",
      "q_agg_quantile_approx", "q_pipe_profile_approx", "q_stream_late")
    println(s"queries=${qs.size} oracles=${os.size} survey=${survey.size}")
    var ok = true
    def flag(name: String, xs: Set[String]): Unit = if (xs.nonEmpty) {
      ok = false
      println(s"DRIFT $name: ${xs.toSeq.sorted.mkString(",")}")
    }
    flag("queries-not-in-survey", qs -- survey)
    flag("survey-not-in-queries", survey -- qs)
    flag("unexpected-no-oracle", noOracle -- expectNoOracle)
    flag("missing-no-oracle", expectNoOracle -- noOracle)
    if (!ok) sys.exit(1)
    println("OK: name sets 1:1:1, no-oracle set as declared")
  }
}
