package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.DistRank

/** Dev-only scale A/B for DistRank's two-pass distributed rank vs the
  * single-partition global window it replaced (q_win_ntile /
  * q_pipe_curriculum, round 7), on synthetic input big enough that the
  * one-task window bottleneck actually shows (the 100k-row fixture
  * measures the harness, not the operator — same rationale as
  * NativeScale).
  *
  * Generates n rows with a deterministic pseudo-random double sort key
  * (tie-free via the id tiebreak), then times (warm):
  *   dist — DistRank.withGlobalRank + ntile(4): range partition,
  *          per-partition local rank, broadcast prefix-sum offsets;
  *          every stage partition-parallel;
  *   win  — row_number + ntile(4) over Window.orderBy(v, id): every
  *          row through ONE task (WindowExec "No Partition Defined").
  * Both reduce to the same (rank, bucket) checksum pair; equality is
  * asserted every rep.
  *
  * usage: runMain graft.tools.RankScale [n] [reps]
  */
object RankScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 20000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Deterministic scatter for the sort key; (v, id) is tie-free.
    def data: DataFrame = spark.range(n).select($"id",
      (pmod(hash($"id", lit(7)).cast("long") * 2654435761L, lit(1000000000L))
        .cast("double") / 1e9).as("v"))

    // Checksum the full assignment, not a sample: sum over every row
    // of rank and bucket folded with a small id residue, so any
    // misranked row flips it.
    def checksum(df: DataFrame, rank: org.apache.spark.sql.Column,
                 bucket: org.apache.spark.sql.Column): (Long, Long) = {
      val row = df.agg(
        sum(rank * (($"id" % 997L) + 1L)).cast("long"),
        sum(bucket.cast("long") * (($"id" % 1009L) + 1L)).cast("long")).head
      (row.getLong(0), row.getLong(1))
    }

    def dist(): (Long, Long) = {
      val ranked = DistRank.withGlobalRank(data, cpus.toInt, $"v", $"id")
      checksum(ranked, col(DistRank.RankCol), DistRank.ntile(4))
    }
    def win(): (Long, Long) = {
      val w = Window.orderBy($"v", $"id")
      checksum(data.withColumn("r", row_number().over(w))
        .withColumn("q", ntile(4).over(w)), $"r", $"q")
    }

    for (rep <- 1 to reps) {
      val t0 = System.nanoTime(); val cd = dist()
      val t1 = System.nanoTime(); val cw = win()
      val t2 = System.nanoTime()
      assert(cd == cw, s"rank/bucket checksum mismatch: dist=$cd win=$cw")
      println(f"[rankscale] n=$n rep$rep dist=${(t1 - t0) / 1e9}%.2f s " +
        f"window=${(t2 - t1) / 1e9}%.2f s checksum=$cd")
    }
    spark.stop()
  }
}
