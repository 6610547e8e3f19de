package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: corpus-size scaling probe for the prefix-doubling exact
  * substring dedup (q_dedup_substr_exact). Purpose: substantiate the
  * O(n · log L) claim at the query site — wall time across the three
  * fixture scales (≈150k / 150k / 1.5M corpus chars) should grow
  * roughly linearly with corpus chars, NOT quadratically (an
  * accidental all-pairs or unbounded-class blowup would show here
  * long before a cluster run). Prints chars, spans, wall seconds, and
  * µs-per-char. Run: sbt "runMain graft.tools.SubstrScale". */
object SubstrScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", graft.TempWarehouse.dir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val d = s"/root/testdata/$sf"
      if (new java.io.File(d).isDirectory) {
        import org.apache.spark.sql.functions._
        val chars = spark.read.parquet(s"$d/documents.parquet")
          .agg(sum(length(col("text")))).collect()(0).getLong(0)
        val times = (1 to 2).map { _ =>
          graft.ops.Tables.resetDerived(spark) // no cross-run memo reuse
          val t0 = System.nanoTime()
          val spans = graft.ops.ExtOps.substrExactSpans(spark, d).count()
          ((System.nanoTime() - t0) / 1e9, spans)
        }
        val (sec, spans) = times.minBy(_._1)
        println(f"SUBSTRSCALE $sf%-8s chars=$chars%9d spans=$spans%6d" +
          f" min=$sec%6.2f s  us/char=${sec * 1e6 / chars}%6.2f")
      }
    }
    spark.stop()
  }
}
