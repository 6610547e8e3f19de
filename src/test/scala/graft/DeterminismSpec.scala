package graft

import SparkTestBase.sf0001

/** Determinism harness (SURVEY §5.6): every declared query must return
  * an identical ordered result under different shuffle-partition
  * counts. This catches hidden order dependence (unsorted limits,
  * nondeterministic survivors, summation-order-sensitive unrounded
  * doubles) before the driver's hash compare does — and it is exactly
  * the property that makes results stable when the same plan runs on
  * 1000 executors instead of 4 threads.
  */
class DeterminismSpec extends GraftSuite {

  private def runAll(partitions: String): Map[String, Seq[String]] = {
    spark.conf.set("spark.sql.shuffle.partitions", partitions)
    try SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf0001).collect().map(_.toString).toSeq
    }
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  test("all declared queries are partitioning-invariant (4 vs 7 shuffle partitions)") {
    val a = runAll("4")
    val b = runAll("7")
    val diffs = a.keys.filter(k => a(k) != b(k)).toSeq.sorted
    assert(diffs.isEmpty,
      s"order/content changed with partitioning for: ${diffs.mkString(", ")}")
  }

  test("entry flagship returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is a documented no-oracle row") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === Set("q_agg_approx", "q_stream_late", "q_agg_hll"),
      "only the documented no-oracle rows (SURVEY §2.12 totals) may omit SQL")
  }
}
