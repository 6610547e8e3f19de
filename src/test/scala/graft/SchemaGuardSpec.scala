package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Tables

/** The fixture schema-drift guard (Tables.conform): the driver
  * regenerates fixtures between rounds (events.ts flipped ns→µs in r3,
  * breaking 31 queries with per-query analysis errors), so reads must
  * either normalize the drift (timestamp family) or fail fast with one
  * clear message naming the table and the measured-vs-expected diff.
  */
class SchemaGuardSpec extends GraftSuite {
  private val s = SparkTestBase.spark

  test("conform passes an exact-schema table through unchanged") {
    import s.implicits._
    val raw = Seq((1L, "t", "en", "src0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Tables.conform("documents", raw)
    assert(out.schema === raw.schema)
    assert(out.collect() === raw.collect())
  }

  test("conform normalizes events.ts TIMESTAMP_NTZ to session-tz TIMESTAMP") {
    import s.implicits._
    val raw = Seq((1L, "2024-01-05 10:00:00", 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", $"ts".cast(TimestampNTZType))
    val out = Tables.conform("events", raw)
    assert(out.schema("ts").dataType === TimestampType)
    // Session tz is UTC, so the instant is the literal's wall-clock.
    assert(out.select(unix_timestamp($"ts")).head.getLong(0) === 1704448800L)
  }

  test("conform truncates raw nanos longs (legacy reader) to microseconds") {
    import s.implicits._
    val nanos = 1704448800L * 1000000000L + 123456789L
    val raw = Seq((1L, nanos, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Tables.conform("events", raw)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.select(unix_micros($"ts")).head.getLong(0) ===
      1704448800L * 1000000L + 123456L)
  }

  test("conform rejects long ts values outside the plausible epoch-nanos range") {
    import s.implicits._
    // A genuine int64-MICROseconds value (1000x below the nanos range):
    // dividing it by 1000 would silently shift the clock to 1970 — the
    // magnitude guard must blow up loudly on first read instead.
    val micros = 1704448800L * 1000000L
    val raw = Seq((1L, micros, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val e = intercept[Exception] {
      Tables.conform("events", raw).select($"ts").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("epoch-nanos")),
      s"expected the epoch-nanos guard, got: ${e.getMessage}")
    // NULL ts rows pass through as NULL, not as an error
    val withNull = Seq((1L, Some(1704448800L * 1000000000L), 7L, "click", 1.5, "{}"),
        (2L, None: Option[Long], 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Tables.conform("events", withNull)
      .orderBy($"event_id").select($"ts").collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }

  test("conform fails fast, naming table and column, on a non-timestamp type change") {
    import s.implicits._
    val raw = Seq((1L, "t", "en", "src0", "oops"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val e = intercept[IllegalStateException](Tables.conform("documents", raw))
    assert(e.getMessage.contains("schema drift"))
    assert(e.getMessage.contains("'documents'"))
    assert(e.getMessage.contains("n_chars"))
  }

  test("conform fails fast on a missing column") {
    import s.implicits._
    val raw = Seq((1L, "t", "en")).toDF("doc_id", "text", "lang")
    val e = intercept[IllegalStateException](Tables.conform("documents", raw))
    assert(e.getMessage.contains("missing column source"))
    assert(e.getMessage.contains("missing column n_chars"))
  }

  test("conform widens lossless drift: INT key -> BIGINT, DATE -> timestamp") {
    import s.implicits._
    val raw = Seq((1, "t", "en", "src0", 7))
      .toDF("doc_id", "text", "lang", "source", "n_chars") // INT ids
    val out = Tables.conform("documents", raw)
    assert(out.schema("doc_id").dataType === LongType)
    assert(out.schema("n_chars").dataType === LongType)
    assert(out.select($"doc_id", $"n_chars").head === Row(1L, 7L))

    val rawOrders = Seq((1L, 1L, "O", 10.0, "1996-03-01", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .withColumn("o_orderdate", $"o_orderdate".cast(DateType))
    val outO = Tables.conform("orders", rawOrders)
    assert(outO.schema("o_orderdate").dataType === TimestampNTZType)
    assert(outO.select(date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss"))
      .head.getString(0) === "1996-03-01 00:00:00")
  }

  test("conform still rejects narrowing drift (BIGINT where INT is expected)") {
    import s.implicits._
    val raw = Seq((0L, "AFRICA")).toDF("r_regionkey", "r_name")
    val e = intercept[IllegalStateException](Tables.conform("region", raw))
    assert(e.getMessage.contains("r_regionkey"))
  }

  test("conform keeps extra driver-added columns (queries select by name)") {
    import s.implicits._
    val raw = Seq((1L, "t", "en", "src0", 1L, 9.9))
      .toDF("doc_id", "text", "lang", "source", "n_chars", "novel")
    val out = Tables.conform("documents", raw)
    assert(out.columns.contains("novel"))
  }

  test("every declared fixture table conforms cleanly at sf0.001") {
    Tables.names.foreach { n =>
      val df = Tables.t(s, SparkTestBase.sf0001, n)
      assert(df.count() > 0, s"table $n")
    }
  }
}
