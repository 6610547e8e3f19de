package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming-only semantics (SURVEY §5.5): the behaviors the batch
  * oracle can never see — watermark late-data dropping for
  * q_stream_late's 10-minute watermark, and session merging across
  * micro-batches. Uses MemoryStream exactly as the §2.7 queries would
  * run under Structured Streaming.
  */
class StreamySpec extends GraftSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("10-minute watermark drops events later than the watermark (q_stream_late)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("window_start"), $"n")
    val dir = java.nio.file.Files.createTempDirectory("graft_ck").toString
    val query = agg.writeStream.format("memory").queryName("late_test")
      .outputMode(OutputMode.Append).option("checkpointLocation", dir).start()
    try {
      input.addData((ts("2024-01-01 10:00:00"), 1.0),
                    (ts("2024-01-01 10:05:00"), 2.0))
      query.processAllAvailable()
      // advance event time → watermark becomes 11:50, closing 10:00-11:00
      input.addData((ts("2024-01-01 12:00:00"), 3.0))
      query.processAllAvailable()
      // LATE: behind the watermark — must be dropped, not re-counted
      input.addData((ts("2024-01-01 10:30:00"), 4.0))
      query.processAllAvailable()
      // close the 12:00 window too
      input.addData((ts("2024-01-01 14:00:00"), 5.0))
      query.processAllAvailable()
      val out = s.table("late_test").collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      assert(out("2024-01-01 10:00:00.0") == 2L,
        "late event must not be added to the closed window")
      assert(out("2024-01-01 12:00:00.0") == 1L)
    } finally query.stop()
  }

  test("session windows merge events across micro-batches until the gap exceeds 30 min") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("session_start"), $"n_events")
    val dir = java.nio.file.Files.createTempDirectory("graft_ck2").toString
    val query = agg.writeStream.format("memory").queryName("session_test")
      .outputMode(OutputMode.Append).option("checkpointLocation", dir).start()
    try {
      input.addData((ts("2024-01-01 10:00:00"), 7L))
      query.processAllAvailable()
      // second batch, 10 min later: same session, must merge
      input.addData((ts("2024-01-01 10:10:00"), 7L))
      query.processAllAvailable()
      // 40-min gap then far-future event to finalize everything
      input.addData((ts("2024-01-01 10:50:00"), 7L))
      query.processAllAvailable()
      input.addData((ts("2024-01-01 15:00:00"), 7L))
      query.processAllAvailable()
      val sessions = s.table("session_test").collect()
        .map(r => (r.getTimestamp(1).toString, r.getLong(2))).sorted.toSeq
      assert(sessions.contains(("2024-01-01 10:00:00.0", 2L)),
        "cross-batch events 10 min apart must merge into one session")
      assert(sessions.contains(("2024-01-01 10:50:00.0", 1L)),
        "a 40-min gap must start a new session")
    } finally query.stop()
  }

  test("file-source stream over a parquet directory matches the batch answer") {
    val s = spark
    import s.implicits._
    // materialize a small event table as a parquet directory
    val dir = java.nio.file.Files.createTempDirectory("graft_fs").toString
    val rows = Seq(
      (ts("2024-01-01 10:10:00"), "click", 1.0),
      (ts("2024-01-01 10:40:00"), "click", 2.0),
      (ts("2024-01-01 11:20:00"), "view", 3.0))
      .toDF("ts", "event_type", "value")
    rows.write.mode("overwrite").parquet(dir)
    val agg = s.readStream.schema(rows.schema).parquet(dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("window_start"), $"event_type", $"n")
    val query = agg.writeStream.format("memory").queryName("fs_test")
      .outputMode(OutputMode.Complete).start()
    try {
      query.processAllAvailable()
      val streamed = s.table("fs_test").collect().map(_.toString).sorted.toSeq
      val batch = rows.groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select($"w.start".as("window_start"), $"event_type", $"n")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed === batch)
    } finally query.stop()
  }

  test("dropDuplicatesWithinWatermark dedups across batches with bounded state") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val deduped = input.toDF().toDF("ts", "doc_key")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("doc_key")
    val dir = java.nio.file.Files.createTempDirectory("graft_ck4").toString
    val query = deduped.writeStream.format("memory").queryName("ddw_test")
      .outputMode(OutputMode.Append).option("checkpointLocation", dir).start()
    try {
      input.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:30"), 1L))
      query.processAllAvailable()
      // same key in a LATER batch but within the watermark window: dropped
      input.addData((ts("2024-01-01 10:05:00"), 1L), (ts("2024-01-01 10:05:00"), 2L))
      query.processAllAvailable()
      val out = s.table("ddw_test").collect().map(_.getLong(1)).sorted.toSeq
      assert(out === Seq(1L, 2L), "each key must survive exactly once")
    } finally query.stop()
  }

  test("flatMapGroupsWithState sessionizer matches session_window semantics") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[graft.streaming.SessEvent]
    val sessions = graft.streaming.CustomSessions.sessionize(input.toDS())
    val dir = java.nio.file.Files.createTempDirectory("graft_ck3").toString
    val query = sessions.writeStream.format("memory").queryName("fmgs_test")
      .outputMode(OutputMode.Append).option("checkpointLocation", dir).start()
    try {
      import graft.streaming.SessEvent
      input.addData(SessEvent(7L, ts("2024-01-01 10:00:00")))
      query.processAllAvailable()
      // 10 minutes later, separate micro-batch: must merge
      input.addData(SessEvent(7L, ts("2024-01-01 10:10:00")))
      query.processAllAvailable()
      // 40-minute gap: new session (old one closes when watermark passes)
      input.addData(SessEvent(7L, ts("2024-01-01 10:50:00")))
      query.processAllAvailable()
      // advance the watermark far enough to time out both sessions
      input.addData(SessEvent(8L, ts("2024-01-01 15:00:00")))
      query.processAllAvailable()
      input.addData(SessEvent(8L, ts("2024-01-01 20:00:00")))
      query.processAllAvailable()
      val got = s.table("fmgs_test").collect()
        .filter(_.getLong(0) == 7L)
        .map(r => (r.getTimestamp(1).toString, r.getLong(2))).sorted.toSeq
      assert(got === Seq(("2024-01-01 10:00:00.0", 2L),
                         ("2024-01-01 10:50:00.0", 1L)))
      // State-eviction law: every CLOSED session emits EXACTLY once
      // (emit removes state, so a later watermark advance can't
      // re-fire it), and the final still-open session (user 8 @ 20:00,
      // watermark never passes its close) emits ZERO times — state is
      // only ever released through the timeout path.
      val all = s.table("fmgs_test").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      assert(all.length === all.distinct.length, s"duplicate emission: ${all.toSeq}")
      assert(all.count(_._1 == 8L) === 1,
        "user 8: first session closed by watermark, open session unemitted")
    } finally query.stop()
  }

  test("transformWithState keeps the per-user high-water mark across micro-batches") {
    val s = spark
    import s.implicits._
    // The new-API state store: RocksDB provider in a child session
    // (same isolation as q_stream_tws / q_stream_rocksdb).
    val cs = ops.Tables.childSession(s, "tws_spec")(
      "spark.sql.streaming.stateStore.providerClass" ->
        ("org.apache.spark.sql.execution.streaming.state" +
          ".RocksDBStateStoreProvider"))
    import graft.streaming.HwEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = cs.sqlContext
    val input = MemoryStream[HwEvent]
    val marks = graft.streaming.HighWater.marks(input.toDS())
    val dir = java.nio.file.Files.createTempDirectory("graft_ck6").toString
    val query = marks.writeStream.format("memory").queryName("tws_test")
      .outputMode(OutputMode.Append).option("checkpointLocation", dir).start()
    try {
      input.addData(HwEvent(7L, 1L, ts("2024-01-01 10:00:00"), 5.0))
      query.processAllAvailable()
      // Later batch, lower value: state must REMEMBER the 5.0 → no emit.
      input.addData(HwEvent(7L, 2L, ts("2024-01-01 10:01:00"), 3.0))
      query.processAllAvailable()
      // New high: emits. Other user: independent state, emits.
      input.addData(HwEvent(7L, 3L, ts("2024-01-01 10:02:00"), 7.0),
                    HwEvent(8L, 4L, ts("2024-01-01 10:02:00"), 1.0))
      query.processAllAvailable()
      val got = cs.table("tws_test").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === Seq((7L, 1L), (7L, 3L), (8L, 4L)),
        s"cross-batch ValueState drifted: $got")
    } finally query.stop()
  }

  test("q_stream_custom_state (batch flush) ≡ session_window sessionization") {
    // The declared batch form of the flatMapGroupsWithState sessionizer
    // must agree row-for-row with the built-in session_window on the
    // same gap — the law that the custom state machine implements
    // exactly the operator semantics it claims to generalize.
    val s = spark
    import s.implicits._
    val custom = q("q_stream_custom_state", SparkTestBase.sf0001).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSeq
    val builtin = ops.Tables.t(s, SparkTestBase.sf0001, "events")
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("session_start"), $"n_events")
      .orderBy($"user_id", $"session_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSeq
    assert(custom === builtin)
  }

  test("stream-stream interval join matches pairs across micro-batches (q_stream_join)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val clickIn = MemoryStream[(Timestamp, Long)]
    val purchIn = MemoryStream[(Timestamp, Long)]
    val clicks = clickIn.toDF().toDF("cts", "cu")
      .withWatermark("cts", "10 minutes")
    val purchases = purchIn.toDF().toDF("pts", "pu")
      .withWatermark("pts", "10 minutes")
    val joined = purchases.join(clicks, $"cu" === $"pu" &&
        $"cts" >= $"pts" - expr("INTERVAL 30 MINUTES") && $"cts" <= $"pts")
      .select($"pu", $"pts", $"cts")
    val dir = java.nio.file.Files.createTempDirectory("graft_ck5").toString
    val query = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode(OutputMode.Append).option("checkpointLocation", dir).start()
    try {
      // click arrives in batch 1; matching purchase in batch 2 —
      // the join must hold click state across micro-batches.
      clickIn.addData((ts("2024-01-01 10:00:00"), 7L))
      query.processAllAvailable()
      purchIn.addData((ts("2024-01-01 10:20:00"), 7L))
      query.processAllAvailable()
      // out-of-interval click (40 min before) and wrong-user purchase:
      // neither may produce a pair.
      clickIn.addData((ts("2024-01-01 11:00:00"), 9L))
      purchIn.addData((ts("2024-01-01 11:40:00"), 9L))
      query.processAllAvailable()
      val out = s.table("ssj_test").collect()
        .map(r => (r.getLong(0), r.getTimestamp(2).toString)).sorted.toSeq
      assert(out === Seq((7L, "2024-01-01 10:00:00.0")),
        s"exactly the in-interval same-user pair must match, got $out")
    } finally query.stop()
  }

  test("stream-stream LEFT OUTER join emits the null-padded row only after " +
      "the watermark passes the join window (q_stream_join_outer)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val clickIn = MemoryStream[(Timestamp, Long)]
    val purchIn = MemoryStream[(Timestamp, Long)]
    val clicks = clickIn.toDF().toDF("cts", "cu")
      .withWatermark("cts", "10 minutes")
    val purchases = purchIn.toDF().toDF("pts", "pu")
      .withWatermark("pts", "10 minutes")
    val joined = purchases.join(clicks, $"cu" === $"pu" &&
        $"cts" >= $"pts" - expr("INTERVAL 30 MINUTES") && $"cts" <= $"pts",
        "leftOuter")
      .select($"pu", $"pts", $"cts")
    val dir = java.nio.file.Files.createTempDirectory("graft_ck6").toString
    val query = joined.writeStream.format("memory").queryName("ssjo_test")
      .outputMode(OutputMode.Append).option("checkpointLocation", dir).start()
    try {
      def rows() = s.table("ssjo_test").collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(2)).map(_.toString)))
        .sorted.toSeq
      // Matched purchase (user 7, click 20 min prior) and an
      // unmatched one (user 9, no click at all).
      clickIn.addData((ts("2024-01-01 10:00:00"), 7L))
      purchIn.addData((ts("2024-01-01 10:20:00"), 7L),
                      (ts("2024-01-01 10:20:00"), 9L))
      query.processAllAvailable()
      // The INNER pair may emit immediately; the null-padded row for
      // user 9 MUST NOT — a matching click (cts in [09:50, 10:20])
      // could still arrive until the click watermark passes 10:20.
      assert(rows() === Seq((7L, Some("2024-01-01 10:00:00.0"))),
        "null-padded row leaked before the watermark closed the window")
      // Advance event time on BOTH streams (the global watermark is
      // the min): 12:00 − 10 min delay = 11:50 > 10:20, so user 9's
      // join window is closed and the watermark EMITS the outer row.
      clickIn.addData((ts("2024-01-01 12:00:00"), 99L))
      purchIn.addData((ts("2024-01-01 12:00:00"), 98L))
      query.processAllAvailable()
      // One more micro-batch: the state-eviction pass that emits outer
      // rows runs against the watermark SET by the previous batch.
      clickIn.addData((ts("2024-01-01 12:01:00"), 99L))
      purchIn.addData((ts("2024-01-01 12:01:00"), 98L))
      query.processAllAvailable()
      assert(rows().contains((9L, None)),
        s"watermark must emit the unmatched purchase null-padded, got ${rows()}")
      assert(rows().count(_._1 == 7L) === 1,
        "the matched purchase must not re-emit as an outer row")
    } finally query.stop()
  }

  test("stream-stream FULL OUTER join null-pads BOTH sides only after " +
      "the watermark closes the window (q_stream_join_full)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val clickIn = MemoryStream[(Timestamp, Long)]
    val purchIn = MemoryStream[(Timestamp, Long)]
    val clicks = clickIn.toDF().toDF("cts", "cu")
      .withWatermark("cts", "10 minutes")
    val purchases = purchIn.toDF().toDF("pts", "pu")
      .withWatermark("pts", "10 minutes")
    val joined = purchases.join(clicks, $"cu" === $"pu" &&
        $"cts" >= $"pts" - expr("INTERVAL 30 MINUTES") && $"cts" <= $"pts",
        "full")
      .select($"pu", $"cu", $"pts", $"cts")
    val dir = java.nio.file.Files.createTempDirectory("graft_ck6").toString
    val query = joined.writeStream.format("memory").queryName("ssjf_test")
      .outputMode(OutputMode.Append).option("checkpointLocation", dir).start()
    try {
      def rows() = s.table("ssjf_test").collect()
        .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
          Option(r.get(1)).map(_.asInstanceOf[Long]))).sorted.toSeq
      // Matched pair (user 7), unmatched purchase (user 9, no click),
      // unmatched click (user 5, converts nothing).
      clickIn.addData((ts("2024-01-01 10:00:00"), 7L),
                      (ts("2024-01-01 10:00:00"), 5L))
      purchIn.addData((ts("2024-01-01 10:20:00"), 7L),
                      (ts("2024-01-01 10:20:00"), 9L))
      query.processAllAvailable()
      // Only the inner pair may emit now: user 9's purchase could
      // still match a late click, and user 5's click could still
      // match a purchase until 10:30 (cts + 30 min) passes.
      assert(rows() === Seq((Some(7L), Some(7L))),
        s"outer rows leaked before the watermark closed: ${rows()}")
      // Advance both watermarks well past every window, then one more
      // batch so eviction runs against the new watermark.
      clickIn.addData((ts("2024-01-01 12:00:00"), 99L))
      purchIn.addData((ts("2024-01-01 12:00:00"), 98L))
      query.processAllAvailable()
      clickIn.addData((ts("2024-01-01 12:01:00"), 99L))
      purchIn.addData((ts("2024-01-01 12:01:00"), 98L))
      query.processAllAvailable()
      assert(rows().contains((Some(9L), None)),
        s"unmatched purchase must null-pad the click side: ${rows()}")
      assert(rows().contains((None, Some(5L))),
        s"unmatched click must null-pad the purchase side: ${rows()}")
      assert(rows().count(_ == (Some(7L), Some(7L))) === 1,
        "the matched pair must not re-emit as an outer row")
    } finally query.stop()
  }

  test("transformWithState ListState+MapState trail persists across batches " +
      "and flushes on an event-time timer (TrailWindow)") {
    val s = spark
    import graft.streaming.{TrailEvent, TrailWindow}
    val cs: org.apache.spark.sql.SparkSession =
      ops.Tables.childSession(s, "twslist_spec")(
        "spark.sql.streaming.stateStore.providerClass" ->
          ("org.apache.spark.sql.execution.streaming.state" +
            ".RocksDBStateStoreProvider"))
    import cs.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = cs.sqlContext
    val input = MemoryStream[TrailEvent]
    import org.apache.spark.sql.streaming.TimeMode
    val out = input.toDS()
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(
        new TrailWindow(emitOnInput = false, timerGapMs = 60000L),
        TimeMode.EventTime(), OutputMode.Append())
    val dir = java.nio.file.Files.createTempDirectory("graft_ck6").toString
    val query = out.toDF().writeStream.format("memory")
      .queryName("trail_test")
      .outputMode(OutputMode.Append).option("checkpointLocation", dir).start()
    try {
      // Batch 1: two events; no output (summaries flush by timer only).
      input.addData(
        TrailEvent(7L, 1L, ts("2024-01-01 10:00:00"), "a", 1.0),
        TrailEvent(7L, 2L, ts("2024-01-01 10:01:00"), "b", 2.0))
      query.processAllAvailable()
      assert(cs.table("trail_test").isEmpty,
        "nothing may emit before the inactivity timer fires")
      // Batch 2: two more for the same user — MapState counts and the
      // ListState trail must pick up where batch 1 left them.
      input.addData(
        TrailEvent(7L, 3L, ts("2024-01-01 10:02:00"), "a", 3.0),
        TrailEvent(7L, 4L, ts("2024-01-01 10:03:00"), "a", 4.0))
      query.processAllAvailable()
      // Advance the watermark past the timer (10:03 + 1 min), twice so
      // expiry runs against the advanced watermark.
      input.addData(TrailEvent(99L, 5L, ts("2024-01-01 10:30:00"), "z", 0.0))
      query.processAllAvailable()
      input.addData(TrailEvent(99L, 6L, ts("2024-01-01 10:31:00"), "z", 0.0))
      query.processAllAvailable()
      val got = cs.table("trail_test").collect()
        .filter(_.getLong(0) == 7L)
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3),
          r.getLong(4), r.getDouble(5), r.getBoolean(6))).toSeq
      // 4 lifetime events, 2 types, top = a×3, trail = last 3 values
      // (2.0 + 3.0 + 4.0) — state spanning both input batches.
      assert(got === Seq((7L, 4L, 2, "a", 3L, 9.0, true)),
        s"cross-batch multi-state trail drifted: $got")
    } finally query.stop()
  }

  test("stream-static broadcast join enriches a stream against a dimension") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val dim = Seq((7L, "gold"), (9L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[(Timestamp, Long)]
    val joined = input.toDF().toDF("ts", "user_id")
      .join(broadcast(dim), "user_id") // inner: unknown users drop out
    val query = joined.writeStream.format("memory").queryName("ssd_test")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 7L),
        (ts("2024-01-01 10:01:00"), 9L),
        (ts("2024-01-01 10:02:00"), 5L)) // no dim row → dropped
      query.processAllAvailable()
      val out = s.table("ssd_test").collect()
        .map(r => (r.getLong(0), r.getString(2))).sorted.toSeq
      assert(out === Seq((7L, "gold"), (9L, "basic")).sortBy(_._1))
    } finally query.stop()
  }

  test("RocksDB state store provider sustains a streaming agg across batches") {
    // At 100 TB of stream state, JVM-heap HDFSBackedStateStore OOMs;
    // RocksDB keeps state off-heap/on-disk with incremental
    // checkpoints. Pin that the provider actually runs and produces
    // the same per-key counts across micro-batches.
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, Double)]
      val agg = input.toDF().toDF("k", "v")
        .groupBy($"k").agg(count(lit(1)).as("n"), round(sum($"v"), 2).as("sv"))
      val query = agg.writeStream.format("memory").queryName("rocks_test")
        .outputMode(OutputMode.Complete).start()
      try {
        input.addData(("a", 1.0), ("b", 2.0)); query.processAllAvailable()
        input.addData(("a", 3.5), ("c", 1.0)); query.processAllAvailable()
        val out = s.table("rocks_test").collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
        assert(out === Map("a" -> ((2L, 4.5)), "b" -> ((1L, 2.0)),
          "c" -> ((1L, 1.0))))
        // the running query's state store must really be RocksDB
        assert(query.lastProgress.stateOperators(0).customMetrics
          .keySet.toString.contains("rocksdb"),
          "state operator metrics must come from the RocksDB provider")
      } finally query.stop()
    } finally prev match {
      case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState keeps per-key running state across batches (Spark 4 API)") {
    // The successor to [flat]mapGroupsWithState: typed per-key state
    // handles (ValueState/ListState/Map), timers, TTL — and it only
    // runs on the RocksDB provider, i.e. the off-heap state path.
    import org.apache.spark.sql.{Encoders => Encs}
    import org.apache.spark.sql.streaming.{StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      class RunningTotal
          extends StatefulProcessor[String, (String, Double), (String, Double)] {
        @transient private var total: ValueState[Double] = _
        override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
          total = getHandle.getValueState[Double]("total",
            Encs.scalaDouble, TTLConfig.NONE)
        override def handleInputRows(key: String,
            rows: Iterator[(String, Double)],
            tv: TimerValues): Iterator[(String, Double)] = {
          val sum = (if (total.exists()) total.get() else 0.0) +
            rows.map(_._2).sum
          total.update(sum)
          Iterator.single((key, sum))
        }
      }
      val input = MemoryStream[(String, Double)]
      val out = input.toDS().groupByKey(_._1)
        .transformWithState(new RunningTotal, TimeMode.None(),
          OutputMode.Update())
      val query = out.toDF("k", "total").writeStream.format("memory")
        .queryName("tws_test").outputMode(OutputMode.Update)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_tws").toString)
        .start()
      try {
        input.addData(("a", 1.0), ("a", 2.0), ("b", 5.0))
        query.processAllAvailable()
        input.addData(("a", 4.0)) // must ADD to a's state from batch 0
        query.processAllAvailable()
        val rows = s.table("tws_test").collect()
          .map(r => (r.getString(0), r.getDouble(1))).toSet
        assert(rows === Set(("a", 3.0), ("b", 5.0), ("a", 7.0)))
      } finally query.stop()
    } finally prev match {
      case Some(p) =>
        s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("q_stream_sink's streamed update-log merge equals the batch group-by") {
    // The declared row runs a REAL AvailableNow stream (file source →
    // update-mode count → foreachBatch); its terminal merged state
    // must land on exactly what one batch pass computes.
    val got = q("q_stream_sink", SparkTestBase.sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val expect = ops.Tables.t(spark, SparkTestBase.sf0001, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq
    assert(got === expect)
    // ...and the RocksDB-provider variant must be semantics-free
    val rocks = q("q_stream_rocksdb", SparkTestBase.sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(rocks === expect)
  }

  test("foreachBatch + overwrite-by-batchId sink is idempotent under batch replay") {
    // Exactly-once file output without a transactional table format:
    // partition the sink by batch_id and dynamically overwrite only
    // that partition — replaying a batch after a failure rewrites the
    // same partition instead of appending duplicates.
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val sink = java.nio.file.Files.createTempDirectory("graft_e1").toString + "/out"
    val prevMode = s.conf.get("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    def writeBatch(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").partitionBy("batch_id").parquet(sink)
    try {
      val input = MemoryStream[(Long, Double)]
      val query = input.toDF().toDF("id", "v").writeStream
        .foreachBatch(writeBatch _)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_e1ck").toString)
        .start()
      try {
        input.addData((1L, 1.0), (2L, 2.0)); query.processAllAvailable()
        input.addData((3L, 3.0)); query.processAllAvailable()
        assert(s.read.parquet(sink).count() === 3)
        // simulate the failure-replay: batch 1 runs AGAIN
        writeBatch(Seq((3L, 3.0)).toDF("id", "v"), 1L)
        assert(s.read.parquet(sink).count() === 3,
          "replaying a batch must not duplicate its rows")
        // ...and an append-mode sink would have duplicated it
        assert(s.read.parquet(sink).select($"id").distinct().count() === 3)
      } finally query.stop()
    } finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
  }

  test("q_stream_tumble batch result equals the same pipeline under streaming") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    // batch answer on the micro fixture
    val batch = q("q_stream_tumble", SparkTestBase.microDir).collect()
      .map(_.toString).sorted.toSeq
    // stream the same rows through the identical operator chain
    val ev = ops.Tables.t(s, SparkTestBase.microDir, "events")
      .select($"ts", $"event_type", $"value")
      .as[(Timestamp, String, Double)].collect().toSeq
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = input.toDF().toDF("ts", "event_type", "value")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .select($"w.start".as("window_start"), $"event_type", $"n", $"sum_value")
    val query = agg.writeStream.format("memory").queryName("tumble_test")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(ev: _*)
      query.processAllAvailable()
      val streamed = s.table("tumble_test").collect()
        .map(_.toString).sorted.toSeq
      assert(streamed === batch)
    } finally query.stop()
  }

  test("a stopped query resumes from its checkpoint with no loss or double-count") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    def agg = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
    val ck = java.nio.file.Files.createTempDirectory("graft_ck_resume").toString
    // the memory sink refuses checkpoint recovery; foreachBatch is the
    // recoverable sink (batch-id replay), matching the exactly-once
    // pattern the sink-discipline test uses
    val state = scala.collection.concurrent.TrieMap.empty[Long, Long]
    def start() = agg.writeStream
      .outputMode(OutputMode.Update).option("checkpointLocation", ck)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => state(r.getLong(0)) = r.getLong(1))
      }.start()
    val q1 = start()
    try {
      input.addData((ts("2024-01-01 10:00:00"), 7L),
                    (ts("2024-01-01 10:01:00"), 7L))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(state(7L) === 2L)
    // restart against the SAME checkpoint: committed state must carry
    // over — the pre-stop rows count once, new rows accumulate on top
    val q2 = start()
    try {
      input.addData((ts("2024-01-01 10:02:00"), 7L))
      q2.processAllAvailable()
      assert(state(7L) === 3L,
        "restart must resume the count at 2, not reset or re-add")
    } finally q2.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses cross-batch duplicates (q_stream_dedup)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val dd = input.toDF().toDF("ts", "user_id", "event_type")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("graft_ck_dd").toString
    val query = dd.writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append).option("checkpointLocation", dir).start()
    try {
      input.addData((ts("2024-01-01 10:00:00"), 7L, "click"))
      query.processAllAvailable()
      // same key arriving in a LATER micro-batch, still within the
      // watermark: the whole point of dedup state — must be suppressed
      input.addData((ts("2024-01-01 10:05:00"), 7L, "click"),
                    (ts("2024-01-01 10:06:00"), 8L, "view"))
      query.processAllAvailable()
      val out = s.table("dedup_test").collect()
        .map(r => (r.getLong(1), r.getString(2))).sorted.toSeq
      assert(out === Seq((7L, "click"), (8L, "view")),
        "cross-batch duplicate within the watermark must be dropped")
    } finally query.stop()
  }
}
