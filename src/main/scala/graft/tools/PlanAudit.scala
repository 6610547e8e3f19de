package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only audit: prints one line per declared query flagging the
  * physical-plan patterns that become bottlenecks at cluster scale —
  * CartesianProduct, BroadcastNestedLoopJoin, and a Window with no
  * PARTITION BY (all-data-to-one-task).
  *
  * GlobalWindow is a HARD failure (exit 1): since round 7 the two
  * contractual total orders (q_win_ntile, q_pipe_curriculum) compute
  * exact ranks via DistRank's two-pass distributed form, so no
  * shipped plan may funnel all rows through one task. Any new flag
  * is a regression.
  *
  * Expected soft flags (audited 174 queries; everything else is
  * clean) — BNLJ with a deliberately tiny broadcast side:
  *    q_join_cross (5x6 cartesian semantics), q_join_fuzzy (20-row
  *    distinct dim), q_join_skew_salt (dim x salt replication),
  *    q_sim_cosine_topk / q_sim_knn_join / q_sim_ann_ivf /
  *    q_sim_pairs / q_sim_range / q_sim_mmr (1-20 row query batch,
  *    centroid set, or top-8 shortlist vs streamed corpus),
  *    q_text_tfidf / q_text_pmi / q_text_jsd / q_text_bm25 /
  *    q_pipe_oversample / q_pipe_drift / q_pipe_benford /
  *    q_pipe_tokenbudget / q_pipe_curriculum / q_pipe_zorder /
  *    q_graph_pagerank (1-row scalar totals, vocab grids, or
  *    |V|-sized rank tables), q_sim_kmeans / q_dedup_semdedup (8-row
  *    centroid/prototype batch), q_sim_recall (two 10-row top-k
  *    sets), q_dedup_ngram (broadcast block table for triangle
  *    blocking; the pair join itself is keyed), q_win_ntile
  *    (DistRank's ≤32-row offset triangle + 1-row total),
  *    q_pipe_temperature (|langs|-row rate table).
  *
  * Round-11 additions, same deliberately-tiny-broadcast class (each
  * side documented at the query site): q_agg_chisq / q_agg_mutualinfo
  * (grand total), q_text_kneserney (|bigram types| scalar),
  * q_pipe_elo (per-round normalizer), q_pipe_targetenc (global
  * prior), q_graph_hits (per-half-round L1 normalizer),
  * q_pipe_survival (≤31-row day-table triangles — the DistRank
  * offset-triangle pattern), q_sink_dsv2 (1-row manifest totals),
  * q_sim_pca (1-row norm/sign scalars against the d-row vector).
  */
object PlanAudit {

  /** Single-task window detector, shared with DistRankSpec so the
    * audit gate and the spec can never disagree on what "global
    * window" means: a partitioned Window prints
    * `Window [fns], [partCols], [order]`; global = only one trailing
    * group AND it is an ORDER spec (contains ASC/DESC) — a
    * partition-only window (no order) also has one group but no sort
    * direction in it. */
  def hasGlobalWindow(plan: String): Boolean =
    plan.linesIterator.exists { l =>
      val t = l.trim.stripPrefix("+- ").stripPrefix(":- ")
      t.startsWith("Window [") && {
        val groups = "\\], \\[".r.findAllIn(t).size
        groups < 2 && (t.contains(" ASC") || t.contains(" DESC"))
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Same writable, repo-clean catalog location Verify/Bench use —
      // without it the bucketed/partitioned-table queries
      // (q_join_bucket, q_join_dpp) would write spark-warehouse/ into
      // whatever cwd the audit runs from.
      .config("spark.sql.warehouse.dir", graft.TempWarehouse.dir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var globalWindows = List.empty[String]
    var errored = List.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> p.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" -> p.contains("BroadcastNestedLoopJoin"),
          "GlobalWindow" -> hasGlobalWindow(p),
        ).collect { case (f, true) => f }
        if (flags.contains("GlobalWindow")) globalWindows ::= name
        println(s"[audit] $name: ${if (flags.isEmpty) "clean" else flags.mkString(",")}")
      } catch { case e: Throwable =>
        // An erroring query's plan was NEVER checked — that must fail
        // the gate too, or a broken query silently bypasses the audit.
        errored ::= name
        println(s"[audit] $name: ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
    if (globalWindows.nonEmpty || errored.nonEmpty) {
      if (globalWindows.nonEmpty) System.err.println(
        s"[audit] FAIL: global (single-task) window in ${globalWindows.sorted.mkString(", ")}")
      if (errored.nonEmpty) System.err.println(
        s"[audit] FAIL: unauditable (errored) queries: ${errored.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
