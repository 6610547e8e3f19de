package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark harness: wall-clock per declared query at the driver's
  * scale factor (SURVEY §6). One JSON line on stdout AND a plain
  * `bench.json` file in the cwd so the driver can parse the result
  * even when sbt decorates stdout with [info] prefixes.
  *
  * Failures are NOT folded into timings (round-1 flaw): a failing
  * query records -1.0 and its name lands in `errors`; the `total`
  * covers successful queries only.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: JVM/codegen/parquet-footer costs must not be charged to
    // whichever query happens to run first (round-1: +7s on q_agg_stats).
    ops.Tables.names.foreach { n =>
      try ops.Tables.t(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }

    var errors = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          errors ::= name; false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val errJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench.json"), line + "\n")
    spark.stop()
    // After spark.stop() so no executor log lines trail it on stdout.
    System.out.println(line)
  }
}
