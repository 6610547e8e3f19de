package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Non-parquet source/sink paths (SURVEY §2.1 sink note: CSV/JSON are
  * exercised in unit tests since fixtures are parquet-only) and the
  * counters surface (SURVEY §1.1: MapReduce counters → df.observe /
  * accumulators).
  */
class SourcesSpec extends GraftSuite {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("CSV round-trip preserves rows and schema with explicit types") {
    import spark.implicits._
    val dir = tmp("graft_csv")
    val src = ops.Tables.t(spark, SparkTestBase.sf0001, "nation")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.orderBy($"n_nationkey").collect().toSeq ===
      src.orderBy($"n_nationkey").collect().toSeq)
  }

  test("JSON round-trip preserves rows; schema inference finds the columns") {
    import spark.implicits._
    val dir = tmp("graft_json")
    val src = ops.Tables.t(spark, SparkTestBase.sf0001, "region")
    src.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
      .select($"r_regionkey".cast("int"), $"r_name")
    assert(back.orderBy($"r_regionkey").collect().toSeq ===
      src.orderBy($"r_regionkey").collect().toSeq)
  }

  test("corrupt JSON records are quarantined, not fatal (PERMISSIVE) — and FAILFAST throws") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = tmp("graft_badjson")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.json"),
      """{"id": 1, "v": "ok"}
        |{"id": 2, "v": "also ok"}
        |{"id": 3, "v": BROKEN
        |""".stripMargin)
    // A 100-TB ingest can't die on one bad row: PERMISSIVE parses the
    // good rows and captures the raw bad line in _corrupt_record for a
    // quarantine sink.
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType), StructField("_corrupt_record", StringType)))
    val rows = spark.read.schema(schema).json(dir).cache()
    try {
      assert(rows.where($"_corrupt_record".isNull).count() === 2)
      val bad = rows.where($"_corrupt_record".isNotNull).collect()
      assert(bad.length === 1 && bad(0).getString(2).contains("BROKEN"))
      // FAILFAST is the opt-in strict mode for validated inputs.
      val strict = intercept[org.apache.spark.SparkException] {
        spark.read.schema(StructType(schema.dropRight(1)))
          .option("mode", "FAILFAST").json(dir).collect()
      }
      assert(strict.getMessage.toLowerCase.contains("malformed") ||
        Option(strict.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
    } finally rows.unpersist()
  }

  test("ORC round-trip preserves rows and schema") {
    import spark.implicits._
    val dir = tmp("graft_orc")
    val src = ops.Tables.t(spark, SparkTestBase.sf0001, "supplier")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === src.schema)
    assert(back.orderBy($"s_suppkey").collect().toSeq ===
      src.orderBy($"s_suppkey").collect().toSeq)
  }

  test("q_scan_orc pushes the balance filter into the ORC scan") {
    // The declared ORC row must keep parquet-class scan machinery:
    // the s_acctbal predicate reaches the reader as a pushed filter
    // (stripe/row-group stats pruning), not a post-scan Filter only.
    val plan = q("q_scan_orc", SparkTestBase.sf0001)
      .queryExecution.executedPlan.toString
    val orcLine = plan.linesIterator
      .find(l => l.contains("orc") && l.contains("PushedFilters"))
    assert(orcLine.isDefined, s"no ORC scan with PushedFilters in:\n$plan")
    assert(orcLine.get.contains("GreaterThan(s_acctbal,1000.0)"), orcLine.get)
  }

  test("q_scan_nested prunes the nested read to exactly the touched leaf fields") {
    // Nested schema pruning is the row's 100 TB point: the scan must
    // read 3 leaf columns (cust.o_orderstatus, items.l_quantity,
    // items.l_extendedprice), not rehydrate the whole structs. Pin on
    // the scan's ReadSchema: the untouched leaves (o_custkey,
    // l_linenumber) must be absent.
    val plan = q("q_scan_nested", SparkTestBase.sf0001)
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("orders_nested") && l.contains("ReadSchema"))
    assert(scanLine.isDefined, s"no nested parquet scan in:\n$plan")
    val rs = scanLine.get
    assert(rs.contains("o_orderstatus") && rs.contains("l_quantity"),
      s"pruned leaves missing from ReadSchema: $rs")
    assert(!rs.contains("o_custkey") && !rs.contains("l_linenumber"),
      s"untouched nested leaves must be pruned from ReadSchema: $rs")
  }

  test("schema evolution: mergeSchema unions columns across parquet file generations") {
    import spark.implicits._
    // Generation 1 lacks the column generation 2 adds — the normal
    // life of a long-lived 100-TB dataset. mergeSchema must read both
    // with the union schema, nulling the missing column.
    val dir = tmp("graft_evolve")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/g=1")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.parquet(s"$dir/g=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("g", "id", "score", "v"))
    val rows = merged.orderBy($"id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")),
      "old-generation rows must read the new column as null")
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) === 9.5)
  }

  test("df.observe exposes counter-style metrics without a second pass") {
    import spark.implicits._
    val observed = ops.Tables.t(spark, SparkTestBase.sf0001, "lineitem")
      .observe("stats", count(lit(1)).as("rows_seen"),
        sum($"l_quantity").as("qty_total"))
    // collect() executes THIS Dataset's plan (count() would plan a
    // separate QueryExecution and the metrics would attach there)
    val n = observed.collect().length.toLong
    val metrics = observed.queryExecution.observedMetrics("stats")
    assert(metrics.getAs[Long]("rows_seen") === n)
    assert(metrics.getAs[Double]("qty_total") > 0.0)
  }

  test("BinaryFrames.decodeFrames samples deterministic frames per payload") {
    import spark.implicits._
    val df = ops.Tables.t(spark, SparkTestBase.sf0001, "documents")
      .where($"doc_id" < 10)
      .select($"doc_id", encode($"text", "UTF-8").as("blob"))
    val frames = graft.sources.BinaryFrames.decodeFrames(df)
    val rows = frames.collect()
    assert(rows.length === 10 * graft.sources.BinaryFrames.FramesPerDoc)
    // deterministic: second run identical
    assert(frames.collect().toSeq === rows.toSeq)
    rows.foreach { f =>
      assert(f.frame_idx >= 0 && f.frame_idx < 4)
      assert(f.byte_val >= 0 && f.byte_val <= 255)
      assert(f.feat >= 0.0 && f.feat <= 1.0)
    }
    // frame 0 is the first payload byte = first text character
    val first = rows.filter(f => f.doc_id == 0L && f.frame_idx == 0).head
    val firstChar = ops.Tables.t(spark, SparkTestBase.sf0001, "documents")
      .where($"doc_id" === 0).select(ascii(substring($"text", 1, 1)))
      .collect()(0).getInt(0)
    assert(first.byte_val === firstChar)
  }

  test("SeqSource DSv2: projection narrows the reader, bounds stay exact") {
    import spark.implicits._
    val df = spark.read.format("graft.sources.SeqSource")
      .option("n", 100L).option("slices", 4).load()
    // Full read matches the closed form.
    assert(df.count() === 100L)
    // Narrow projection: only id is materialized by the reader.
    val ids = df.select($"id").where($"id" < 10L).as[Long].collect().sorted
    assert(ids.toSeq === (0L until 10L))
    // Edge semantics of every pushed comparator on one query each.
    assert(df.where($"id" > 97L).count() === 2L)   // 98, 99
    assert(df.where($"id" >= 97L).count() === 3L)
    assert(df.where($"id" <= 1L).count() === 2L)
    assert(df.where($"id" === 42L).select($"tag").as[String].head() === "t0")
    // Row formula: val = (id % 997)/997, tag = t(id % 7).
    val r = df.where($"id" === 45L).collect()(0)
    assert(r.getDouble(1) === 45 / 997.0 && r.getString(2) === "t3")
  }

  test("BinaryFrames BMP round trip: real ImageIO decode recovers every pixel") {
    import graft.sources.BinaryFrames
    // The encoded payload is a genuine BMP (magic 'BM'), not a stub.
    val bytes = BinaryFrames.encodeBmp(5L)
    assert(bytes(0) === 'B'.toByte && bytes(1) === 'M'.toByte)
    // Decode independently of the query path and check the formula at
    // every coordinate — this is what pins the codec's coordinate
    // frame (BMP rows are stored bottom-up; ImageIO must unflip).
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth === (4 + 5 % 5) && img.getHeight === (3 + 5 % 4))
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val v = ((5L * 7 + x * 13 + y * 31) % 256).toInt
      assert((img.getRGB(x, y) & 0xff) === v, s"pixel ($x,$y)")
    }
    // And through the declared two-stage mapPartitions path.
    import spark.implicits._
    val metas = BinaryFrames.decodeImages(
      spark.range(3).select($"id".as("doc_id"))
        .as[Long].map(id => (id, BinaryFrames.encodeBmp(id)))
        .toDF("doc_id", "blob")).collect().sortBy(_.doc_id)
    assert(metas.map(_.doc_id).toSeq === Seq(0L, 1L, 2L))
    metas.foreach { m =>
      assert(m.px00 === (m.doc_id * 7 % 256).toInt)
      assert(m.width === (4 + m.doc_id % 5).toInt)
    }
  }

  test("BinaryFrames WAV round trip: real javax.sound decode recovers every sample") {
    import graft.sources.BinaryFrames
    // The encoded payload is a genuine RIFF/WAVE container, not raw
    // PCM — header magic proves the library writer ran.
    val bytes = BinaryFrames.encodeWav(5L)
    assert(new String(bytes.take(4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
    // Decode independently of the query path: header fields and every
    // sample must replay the integer formula — this pins byte order
    // (a big/little-endian swap garbles nearly every sample).
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate.toInt === 8000 + (5 % 4) * 4000)
    val n = ais.getFrameLength.toInt
    assert(n === 200 + (5 % 7) * 40)
    val raw = ais.readNBytes(n * 2)
    for (i <- 0 until n) {
      val s =
        if (fmt.isBigEndian) (raw(2 * i) << 8) | (raw(2 * i + 1) & 0xff)
        else (raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)
      assert(s === BinaryFrames.sampleFormula(5L, i), s"sample $i")
    }
    // And through the declared two-stage mapPartitions path — one id
    // per sample-rate residue class, so all four header variants
    // round-trip.
    import spark.implicits._
    val metas = BinaryFrames.decodeAudio(
      spark.range(4).select($"id".as("doc_id"))
        .as[Long].map(id => (id, BinaryFrames.encodeWav(id)))
        .toDF("doc_id", "blob")).collect().sortBy(_.doc_id)
    assert(metas.map(_.doc_id).toSeq === Seq(0L, 1L, 2L, 3L))
    metas.foreach { m =>
      assert(m.sample_rate === (8000 + m.doc_id % 4 * 4000).toInt)
      assert(m.n_samples === 200 + m.doc_id % 7 * 40)
      assert(m.s0 === BinaryFrames.sampleFormula(m.doc_id, 0))
      assert(m.s_mid ===
        BinaryFrames.sampleFormula(m.doc_id, (m.n_samples / 2).toInt))
      val sums = (0 until m.n_samples.toInt).map { i =>
        val s = BinaryFrames.sampleFormula(m.doc_id, i).toLong; s * s
      }.sum
      assert(m.sumsq === sums, s"doc ${m.doc_id}: exact energy fold")
    }
  }

  test("q_multimodal_resize is the identity on an already-4x3 source image") {
    // doc_id ≡ 0 (mod 20) ⇒ encodeBmp dims are exactly the 4×3
    // target, so every thumb pixel samples itself: thumb_sum must
    // equal decodeImages' red_sum and t00 the decoder's px00 probe.
    val dec = q("q_multimodal_decode", SparkTestBase.sf0001).collect()
      .map(r => r.getLong(0) -> (r.getInt(3), r.getLong(5))).toMap
    val rsz = q("q_multimodal_resize", SparkTestBase.sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(5)))
    val ids = rsz.collect { case (id, t00, sum) if id % 20 == 0 && dec.contains(id) =>
      val (px00, redSum) = dec(id)
      assert(t00 === px00, s"doc $id: identity resize must keep (0,0)")
      assert(sum === redSum, s"doc $id: identity resize must keep the sum")
      id
    }
    assert(ids.nonEmpty, "fixture must contain 4x3 sources")
  }

  test("winnowing fingerprints are content-determined: same text, same summary") {
    import spark.implicits._
    val dir = tmp("graft_winnow")
    val t0 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq((0L, t0, "en", "s0", 10L),
        (1L, t0, "en", "s1", 10L), // identical content, different metadata
        (2L, "nothing in common with those docs at all here", "en", "s2", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fps = q("q_text_winnow", dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(fps(0L) === fps(1L), "identical text must fingerprint identically")
    assert(fps(0L) !== fps(2L), "different text must fingerprint differently")
  }

  test("accumulator counts filtered records exactly once per pass") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("bad_rows")
    val docs = ops.Tables.t(spark, SparkTestBase.microDir, "documents")
      .as[(Long, String, String, String, Long)]
    val cleaned = docs.filter { r =>
      val ok = r._2.nonEmpty
      if (!ok) acc.add(1)
      ok
    }
    assert(cleaned.count() === 3)
    assert(acc.value === 0)
  }
}
