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

  test("queries run concurrently on one session match their sequential results") {
    // a multi-user engine executes plans concurrently — any hidden
    // shared mutable state (temp views, registries, caches) between
    // query closures would surface as cross-talk here
    val names = Seq("q_agg_group", "q_agg_gsets", "q_udf_scalar",
      "q_join_broadcast", "q_win_rank", "q_text_wordcount",
      "q_sample_hash", "q_sub_in", "q_dedup_exact", "q_sim_cosine_topk")
    val sequential = names.map(n =>
      n -> SparkEntry.queries(n)(spark, sf0001).collect().map(_.toString).toSeq).toMap
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val concurrent = Await.result(
      Future.sequence(names.map(n => Future(
        n -> SparkEntry.queries(n)(spark, sf0001).collect().map(_.toString).toSeq))),
      5.minutes).toMap
    val diffs = names.filter(n => sequential(n) != concurrent(n))
    assert(diffs.isEmpty, s"concurrent execution diverged for: ${diffs.mkString(", ")}")
  }

  test("every query has an oracle or is a documented no-oracle row") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === Set("q_agg_approx", "q_stream_late", "q_agg_hll",
      "q_agg_quantile_approx", "q_pipe_profile_approx"),
      "only the documented no-oracle rows (SURVEY §2.12 totals) may omit SQL")
  }
}
