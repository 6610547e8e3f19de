package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale A/B for GraphOps.pagerank's two rank-join
  * strategies (q_graph_pagerank vs q_graph_pagerank_part) on a
  * synthetic graph big enough that the per-iteration rank movement —
  * not the harness — dominates (same rationale as RankScale /
  * NativeScale; the fixture graph's |V|≈1.6k measures nothing).
  *
  * Graph: `nodes` vertices, fixed out-degree `k` (src = id DIV k,
  * dst = hash-scatter), so every node has out-degree k ≥ 1 as
  * [[graft.ops.GraphOps.pagerank]] requires. Both strategies run the
  * identical loop; only where edge and rank rows meet differs:
  *   bcast — the |V|-sized rank table broadcasts to every edge
  *           partition each iteration (driver collect + rebroadcast);
  *   copart — edges written ONCE as a 32-bucket table on src; each
  *           iteration shuffles only the rank side into that layout
  *           (SHUFFLE_HASH, no BroadcastExchange — the plan
  *           PlanShapeSpec pins). The one-time bucketed write is
  *           timed separately: it is write-time layout cost, amortized
  *           over every iteration (and every downstream keyed join).
  * Both reduce to the same (count, sum-of-rank-residue) checksum;
  * equality is asserted every rep.
  *
  * Measured on this container (local[32], 3 iterations, min of 2):
  *   |V|=2M, 16M edges: bcast 6.4 s, copart 6.7 s (+10.1 s one-time
  *     layout) — parity; small rank tables broadcast for free.
  *   |V|=8M, 32M edges: bcast 37.0 s, copart 15.3 s (+9.6 s layout)
  *     — 2.4× for the keyed join once the rank table is big enough
  *     that the per-iteration driver collect + rebroadcast dominates.
  * The crossover sits around |V|≈4M even single-node, where
  * broadcast's driver round-trip is cheapest; on a real cluster the
  * gap widens with executor count (broadcast cost is |V| × executors
  * network fan-out, co-part is one |V| shuffle, and the layout cost
  * amortizes over every iteration and every downstream keyed join).
  * At fixture scale (BENCH) broadcast stays faster — tiny |V| makes
  * the driver round trip negligible while the keyed join pays fixed
  * shuffle latency — which is exactly the documented regime split.
  *
  * usage: runMain graft.tools.PageRankScale [nodes] [k] [iters] [reps]
  */
object PageRankScale {
  def main(args: Array[String]): Unit = {
    val nodes = if (args.length > 0) args(0).toLong else 2000000L
    val k = if (args.length > 1) args(1).toInt else 8
    val iters = if (args.length > 2) args(2).toInt else 3
    val reps = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.TempWarehouse.dir())
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Fixed out-degree k per src; dst hash-scattered over the node
    // space. Deterministic (no Math.random), so both strategies and
    // all reps see the identical graph.
    def edges: DataFrame = spark.range(nodes * k).select(
      (col("id") / k).cast("long").as("src"),
      pmod(hash(col("id"), lit(13)).cast("long"), lit(nodes)).as("dst"),
      lit(k.toLong).as("d"))

    def init: DataFrame = spark.range(nodes).select(
      col("id").as("node"), lit(1.0 / nodes).as("r"))

    def checksum(r: DataFrame): (Long, Double) = {
      val row = r.agg(count(lit(1)),
        sum(col("r") * ((col("node") % 997L) + 1L).cast("double"))).head
      (row.getLong(0), row.getDouble(1))
    }

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // One-time co-partitioned layout (what tradeEdgesBkt does for the
    // declared query), timed separately from the loop.
    val bktName = "graft_prscale_edges_bkt"
    val (_, layoutSec) = time {
      graft.ops.LayoutOps.ensureTable(spark, bktName) {
        edges.write.bucketBy(32, "src").mode("overwrite").saveAsTable(bktName)
      }
      spark.table(bktName).count()
    }
    val edgesBkt = spark.table(bktName)
    val edgesCk = edges.localCheckpoint()

    def run(broadcastRank: Boolean): (Long, Double) = {
      val (r, _) = graft.ops.GraphOps.pagerank(
        if (broadcastRank) edgesCk else edgesBkt,
        init, nodes, iters, 0.0, broadcastRank)
      checksum(r)
    }

    println(s"PageRankScale nodes=$nodes k=$k edges=${nodes * k} " +
      s"iters=$iters layout=${f"$layoutSec%.1f"}s")
    var (bBest, cBest) = (Double.MaxValue, Double.MaxValue)
    for (rep <- 1 to reps) {
      val (csB, tB) = time(run(broadcastRank = true))
      val (csC, tC) = time(run(broadcastRank = false))
      // Equal row counts, rank sums within float aggregation-order
      // wobble (the partitioning changes double-add order; the
      // declared query rounds ranks to 1e-6 for the same reason).
      // Reassociation error over n positive doubles grows ~n·eps, so
      // the tolerance scales with the node count (a fixed 1e-9 bound
      // fails spuriously past ~10M nodes: 8M measured ~9e-10).
      val tol = math.max(1e-9, nodes * 4e-16) * math.abs(csB._2)
      require(csB._1 == csC._1 && math.abs(csB._2 - csC._2) <= tol,
        s"strategies disagree: $csB vs $csC")
      bBest = math.min(bBest, tB); cBest = math.min(cBest, tC)
      println(f"rep$rep bcast $tB%.1f s  copart $tC%.1f s  (checksums agree)")
    }
    println(f"BEST bcast $bBest%.1f s  copart $cBest%.1f s  " +
      f"(+ one-time layout $layoutSec%.1f s)")
    spark.stop()
  }
}
