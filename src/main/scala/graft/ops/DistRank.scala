package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global rank without a single-partition window — the two-pass
  * distributed rank that replaces `Window.orderBy(...)` (no
  * partitionBy) wherever an EXACT total order is required
  * (`q_win_ntile`, `q_pipe_curriculum`).
  *
  * Why: a global window moves EVERY row through one task —
  * WindowExec's "No Partition Defined" warning, free at fixture scale
  * and a hard single-task bottleneck at 100 TB. The two-pass form
  * keeps exact semantics with only partition-parallel work:
  *
  *  1. range-partition on the sort key (`repartitionByRange`) — rows
  *     in partition i all precede rows in partition i+1;
  *  2. per-partition local rank — a KEYED window on the physical
  *     partition id, embarrassingly parallel;
  *  3. per-partition row counts → prefix-sum offsets, computed on
  *     ≤ `partitions` rows via a broadcast triangular join (metadata
  *     scale — never a window, so the plan audit's GlobalWindow
  *     detector stays silent end to end);
  *  4. global rank = offset + local rank, attached with one broadcast
  *     hash join.
  *
  * Both branches (local ranks, counts) read the SAME
  * `repartitionByRange` exchange: Spark plans the two references as
  * one reused shuffle stage (canonical-plan exchange reuse, on by
  * default with and without AQE), so the pid seen by the window and
  * the pid counted by the aggregate come from one materialization.
  * The rank-is-a-permutation law and equality with the global-window
  * form are pinned in DistRankSpec; the driver's DuckDB differential
  * re-checks both rewritten queries end to end.
  *
  * The sort key must be a TOTAL order (include a unique tiebreak):
  * ties that straddle a range boundary would otherwise rank by
  * placement, and [[cumeDist]] below is only exact when tie-free.
  */
object DistRank {

  /** Name of the appended global-rank column (1-based, LongType). */
  val RankCol = "_grank"

  /** Name of the appended total-row-count column (LongType). */
  val TotalCol = "_gtotal"

  /** Append [[RankCol]] and [[TotalCol]] under the total order
    * `sort`. `partitions` bounds the range fan-out (any value ≥ 1 is
    * correct; size it like a shuffle partition count). */
  def withGlobalRank(df: DataFrame, partitions: Int, sort: Column*)
      : DataFrame = {
    require(sort.nonEmpty, "distributed rank needs at least one sort column")
    // The pid project sits ABOVE the range exchange and is
    // nondeterministic, so Catalyst cannot push it below the shuffle.
    val ranged = df.repartitionByRange(partitions, sort: _*)
      .withColumn("_gpid", spark_partition_id())
    val counts = ranged.groupBy("_gpid").agg(count(lit(1)).as("_gcnt"))
    // Prefix-sum offsets WITHOUT a global window: a triangular
    // broadcast join over ≤ partitions² pairs of metadata rows.
    val offsets = counts
      .join(broadcast(counts.select(col("_gpid").as("_bpid"),
        col("_gcnt").as("_bcnt"))), col("_bpid") <= col("_gpid"))
      .groupBy(col("_gpid"), col("_gcnt"))
      .agg(sum(col("_bcnt")).as("_gthru"))
      .select(col("_gpid"), (col("_gthru") - col("_gcnt")).as("_goff"))
    val total = counts.agg(sum(col("_gcnt")).cast("long").as(TotalCol))
    val local = ranged.withColumn("_glrank",
      row_number().over(Window.partitionBy(col("_gpid")).orderBy(sort: _*)))
    local.join(broadcast(offsets), "_gpid")
      .crossJoin(broadcast(total))
      .withColumn(RankCol, (col("_goff") + col("_glrank")).cast("long"))
      .drop("_gpid", "_glrank", "_goff")
  }

  /** Exact `NTILE(n)` from a global rank: with N rows the first
    * `N % n` buckets hold `N DIV n + 1` rows, the rest `N DIV n` —
    * bit-identical to the window function's assignment. Pure integer
    * arithmetic (DIV, no doubles), so it is exact at any N. `rank`
    * and `total` are COLUMN NAMES ([[RankCol]]/[[TotalCol]] after
    * [[withGlobalRank]]). */
  def ntile(n: Int, rank: String = RankCol, total: String = TotalCol)
      : Column = {
    require(n >= 1, s"ntile bucket count must be >= 1, got $n")
    val q = s"($total DIV $n)"
    val rem = s"($total % $n)"
    val cut = s"(($q + 1) * $rem)"
    // CASE evaluates lazily, so the ELSE branch's division by q is
    // never reached when q = 0 (N < n puts every rank under cut = N).
    expr(s"""CAST(CASE WHEN $rank <= $cut
            |     THEN ($rank + $q) DIV ($q + 1)
            |     ELSE $rem + ($rank - $cut + $q - 1) DIV $q
            |     END AS INT)""".stripMargin)
  }

  /** `percent_rank()` from a global rank over a tie-free order:
    * (rank − 1) / (N − 1), the same IEEE division the window function
    * performs (0.0 for a single row, per SQL). */
  def percentRank(rank: String = RankCol, total: String = TotalCol): Column =
    when(col(total) > 1,
      (col(rank) - 1).cast("double") / (col(total) - 1)).otherwise(0.0)

  /** `cume_dist()` from a global rank — EXACT only over a tie-free
    * order, where "rows ≤ current" is the rank itself. */
  def cumeDist(rank: String = RankCol, total: String = TotalCol): Column =
    col(rank).cast("double") / col(total)
}
