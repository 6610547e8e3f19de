package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only audit: prints one line per declared query flagging the
  * physical-plan patterns that become bottlenecks at cluster scale —
  * CartesianProduct, BroadcastNestedLoopJoin, and a Window with no
  * PARTITION BY (all-data-to-one-task).
  *
  * Expected flags (audited 174 queries; everything else is clean):
  *  - BNLJ with a deliberately tiny broadcast side: q_join_cross
  *    (5x6 cartesian semantics), q_join_fuzzy (20-row distinct dim),
  *    q_join_skew_salt (dim x salt replication), q_sim_cosine_topk /
  *    q_sim_knn_join / q_sim_ann_ivf / q_sim_pairs / q_sim_range /
  *    q_sim_mmr (1-20 row query batch, centroid set, or top-8
  *    shortlist vs streamed corpus),
  *    q_text_tfidf / q_text_pmi / q_text_jsd / q_text_bm25 /
  *    q_pipe_oversample / q_pipe_drift / q_pipe_benford /
  *    q_pipe_tokenbudget / q_pipe_curriculum / q_pipe_zorder /
  *    q_graph_pagerank (1-row scalar totals, vocab grids, or
  *    |V|-sized rank tables), q_sim_kmeans (8-row centroid batch),
  *    q_sim_recall (two 10-row top-k sets), q_dedup_ngram (broadcast
  *    block table for triangle blocking; the pair join itself is
  *    keyed).
  *  - GlobalWindow: q_win_ntile and q_pipe_curriculum — an exact
  *    total order is those rows' contract (scaladocs name
  *    approx_percentile cuts as the 100 TB replacement).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> p.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" -> p.contains("BroadcastNestedLoopJoin"),
          // a partitioned Window prints "Window [fns], [partCols], [order]";
          // global = only one trailing group AND it is an ORDER spec
          // (contains ASC/DESC) — a partition-only window (no order)
          // also has one group but no sort direction in it
          "GlobalWindow" -> p.linesIterator.exists { l =>
            val t = l.trim.stripPrefix("+- ").stripPrefix(":- ")
            t.startsWith("Window [") && {
              val groups = "\\], \\[".r.findAllIn(t).size
              groups < 2 && (t.contains(" ASC") || t.contains(" DESC"))
            }
          },
        ).collect { case (f, true) => f }
        println(s"[audit] $name: ${if (flags.isEmpty) "clean" else flags.mkString(",")}")
      } catch { case e: Throwable =>
        println(s"[audit] $name: ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
