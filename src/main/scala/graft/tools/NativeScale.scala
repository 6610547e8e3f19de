package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only scale A/B for the native as-of operator vs its window
  * emulation, on synthetic inputs big enough that data-path cost —
  * not stage scheduling — dominates (the fixture's 100k-row events
  * table measures the harness, not the operator; BUILD_NOTES r5).
  *
  * Generates nLeft purchases + nLeft/10 signups over nUsers users
  * with deterministic pseudo-random µs times, then times (warm):
  *   native  — plans/AsofJoin (per-side keyed exchange, streaming
  *             two-pointer merge, O(1) state per co-partition);
  *   window  — the q_join_asof shape (union tag + last(ignoreNulls)
  *             over an unbounded-preceding frame + filter back).
  * Both reduce to the same checksum aggregate; equality is asserted
  * every rep.
  *
  * A second mode A/Bs the (codegen-participating) native sessionize
  * against its two-window emulation on one synthetic sorted stream.
  *
  * A trailing `str` arg re-keys both A/Bs on STRING user ids
  * (`u%09d`) — the round-7 UTF8String codegen path; a trailing
  * `struct` arg re-keys on a COMPOSITE (string bucket, long id)
  * struct — the round-8 field-wise codegen path — so native-vs-
  * emulated is measured for every LLM-pipeline key shape.
  *
  * usage: runMain graft.tools.NativeScale [nLeft] [nUsers] [reps] [str|struct]
  *        runMain graft.tools.NativeScale sessionize [n] [nUsers] [reps] [str|struct]
  */
object NativeScale {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("sessionize")) return sessionizeMain(args.drop(1))
    val keyMode =
      if (args.contains("struct")) "struct"
      else if (args.contains("str")) "str" else "long"
    val nums = args.filterNot(a => a == "str" || a == "struct")
    val nLeft = if (nums.length > 0) nums(0).toLong else 10000000L
    val nUsers = if (nums.length > 1) nums(1).toLong else 100000L
    val reps = if (nums.length > 2) nums(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = 1700000000000000L // µs
    val span = 30L * 24 * 3600 * 1000000 // 30 days in µs
    // Deterministic scatter: times from a 64-bit mix of the row id.
    def mix(c: org.apache.spark.sql.Column) =
      pmod(hash(c, lit(42)).cast("long") * 2654435761L, lit(span))
    def k(c: org.apache.spark.sql.Column) = keyMode match {
      case "str" => format_string("u%09d", c)
      // injective in c (the lo field alone determines it) — the
      // (bucket, id) composite shape PlanUtil.keyCodegen field-codegens
      case "struct" => struct(
        format_string("b%d", pmod(c, lit(16))).as("hi"), c.as("lo"))
      case _ => c
    }
    def purchases: DataFrame = spark.range(nLeft).select(
      $"id".as("event_id"),
      k(pmod($"id" * 31L, lit(nUsers))).as("user_id"),
      (lit(base) + mix($"id")).as("t"))
    def signups: DataFrame = spark.range(nLeft / 10).select(
      ($"id" + 2000000000L).as("signup_event_id"),
      k(pmod($"id" * 17L, lit(nUsers))).as("s_user"),
      (lit(base) + mix($"id" + 7L)).as("s_t"))

    def checksum(df: DataFrame, idCol: String, sidCol: String): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), count(col(sidCol)),
        sum(col(idCol) + coalesce(col(sidCol), lit(0L)))).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    def native(): (Long, Long, Long) = checksum(
      graft.plans.AsofJoin(purchases, signups,
        "user_id", "t", "event_id",
        "s_user", "s_t", "signup_event_id"),
      "event_id", "signup_event_id")

    def window(): (Long, Long, Long) = {
      val tagged = purchases
        .select($"event_id", $"user_id", $"t", lit(1).as("tag"),
          lit(null).cast("long").as("sid"))
        .unionByName(signups.select(
          $"signup_event_id".as("event_id"), $"s_user".as("user_id"),
          $"s_t".as("t"), lit(0).as("tag"),
          $"signup_event_id".as("sid")))
      val w = Window.partitionBy($"user_id")
        .orderBy($"t", $"tag", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      checksum(
        tagged.withColumn("signup_event_id",
            last($"sid", ignoreNulls = true).over(w))
          .filter($"tag" === 1),
        "event_id", "signup_event_id")
    }

    // warm both paths once (codegen, strategy lowering)
    val n0 = native(); val w0 = window()
    require(n0 == w0, s"native $n0 != window $w0")
    println(s"[scale] nLeft=$nLeft nUsers=$nUsers keys=$keyMode checksum=$n0")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val nv = native()
      val t1 = System.nanoTime()
      val wv = window()
      val t2 = System.nanoTime()
      require(nv == wv, s"native $nv != window $wv")
      println(f"[scale] rep$i native ${(t1 - t0) / 1e9}%.2f s, " +
        f"window ${(t2 - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }

  private def sessionizeMain(args: Array[String]): Unit = {
    val keyMode =
      if (args.contains("struct")) "struct"
      else if (args.contains("str")) "str" else "long"
    val nums = args.filterNot(a => a == "str" || a == "struct")
    val n = if (nums.length > 0) nums(0).toLong else 20000000L
    val nUsers = if (nums.length > 1) nums(1).toLong else 100000L
    val reps = if (nums.length > 2) nums(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = 1700000000000000L
    val span = 30L * 24 * 3600 * 1000000
    val gapUs = 12L * 3600 * 1000000
    def k(c: org.apache.spark.sql.Column) = keyMode match {
      case "str" => format_string("u%09d", c)
      case "struct" => struct(
        format_string("b%d", pmod(c, lit(16))).as("hi"), c.as("lo"))
      case _ => c
    }
    def events: DataFrame = spark.range(n).select(
      $"id".as("event_id"),
      k(pmod($"id" * 31L, lit(nUsers))).as("user_id"),
      (lit(base) + pmod(hash($"id", lit(42)).cast("long") * 2654435761L,
        lit(span))).as("t"))
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum($"session_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    def native(): (Long, Long) = checksum(
      graft.plans.Sessionize(events, "user_id", "t", "event_id", gapUs))
    def window(): (Long, Long) = {
      val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
      checksum(events
        .withColumn("newSess",
          when(lag($"t", 1).over(w).isNull ||
            $"t" - lag($"t", 1).over(w) > gapUs, 1L).otherwise(0L))
        .withColumn("session_id", sum($"newSess").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    }
    val n0 = native(); val w0 = window()
    require(n0 == w0, s"native $n0 != window $w0")
    println(s"[scale] sessionize n=$n nUsers=$nUsers keys=$keyMode checksum=$n0")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val nv = native()
      val t1 = System.nanoTime()
      val wv = window()
      val t2 = System.nanoTime()
      require(nv == wv)
      println(f"[scale] rep$i native ${(t1 - t0) / 1e9}%.2f s, " +
        f"window ${(t2 - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
