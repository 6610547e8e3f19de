package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: bpeTrain round-count scaling probe — times the merge
  * training at 3/6/12/24 rounds on SPARK_GRAFT_SF_DIR. Purpose: prove
  * the per-round lazy localCheckpoint made training cost LINEAR in
  * rounds (the unchecked unroll re-derived the word census up to
  * 2^rounds times; real tokenizer training runs thousands of rounds).
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.BpeScale". */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$d/documents.parquet").count() // warm the scan
    Seq(3, 6, 12, 24).foreach { r =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.ops.TextOps.bpeTrain(spark, d, r).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BPESCALE rounds=$r%-3d min=${times.min}%.2f s" +
        f" per-round=${times.min / r}%.3f s")
    }
    spark.stop()
  }
}
