package graft

import org.apache.spark.sql.functions._
import SparkTestBase.{microDir, sf0001}

/** §2.10 pipeline-infrastructure operators: split/sample laws, salt-
  * join result-invariance and plan shape, pivot/quantile/normalize
  * semantics on the handcrafted micro fixture.
  */
class PipeOpsSpec extends GraftSuite {

  test("q_pipe_prepfunnel: strict monotone attrition; the 50% budget cap binds") {
    val rows = q("q_pipe_prepfunnel", sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq(0, 1, 2, 3), "four ordered stages")
    // Every stage must DROP something on the fixture (a vacuous stage
    // means the gate constants no longer bite this data).
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 < a._2 && b._3 <= a._3,
        s"stage ${b._1} must attrit docs vs stage ${a._1}: $b vs $a")
    }
    // Budget law: per-language caps are ≤ 50% of the language's
    // post-gate tokens, so the global stage-3 total is too (floors
    // only shrink caps).
    assert(rows(3)._3 <= rows(2)._3 / 2,
      s"token budget ${rows(3)._3} must be ≤ half of ${rows(2)._3}")
  }

  test("q_pipe_manifest signature flips on a one-row change and ignores order") {
    import spark.implicits._
    def write(rows: Seq[(Long, String, String, String, Long)], dir: String) =
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def sigs(dir: String) = q("q_pipe_manifest", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val a = java.nio.file.Files.createTempDirectory("graft_mfa").toString
    val b = java.nio.file.Files.createTempDirectory("graft_mfb").toString
    val rows = Seq((1L, "x", "en", "s0", 5L), (2L, "y", "en", "s0", 9L))
    write(rows, a)
    write(rows.reverse.map { case (id, t_, l, src, n) =>
      if (id == 2L) (id, t_, l, src, n + 1) else (id, t_, l, src, n) }, b)
    val (sigA, sigB) = (sigs(a), sigs(b))
    assert(sigA.head._2 === sigB.head._2, "counts agree")
    assert(sigA.head._3 !== sigB.head._3,
      "a one-field row change must flip the content signature")
    assert(sigA.head._4 !== sigB.head._4,
      "a one-field row change must flip the content sum")
    // order independence: re-writing A's rows reversed gives A's sig
    val c = java.nio.file.Files.createTempDirectory("graft_mfc").toString
    write(rows.reverse, c)
    assert(sigA.toSeq === sigs(c).toSeq)
  }

  test("q_pipe_manifest content_sum catches the xor-cancelling pair swap") {
    import spark.implicits._
    def write(rows: Seq[(Long, String, String, String, Long)], dir: String) =
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def sigs(dir: String) = q("q_pipe_manifest", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // {A, A, B} vs {D, D, B}: equal counts, and BIT_XOR cancels both
    // duplicate pairs to sig(B) — the substitution the xor fold is
    // blind to by construction. The modular-sum fold must see it.
    val aRow = (1L, "x", "en", "s0", 5L)
    val dRow = (7L, "z", "de", "s0", 3L)
    val bRow = (2L, "y", "en", "s0", 9L)
    val p1 = java.nio.file.Files.createTempDirectory("graft_mfp1").toString
    val p2 = java.nio.file.Files.createTempDirectory("graft_mfp2").toString
    write(Seq(aRow, aRow, bRow), p1)
    write(Seq(dRow, dRow, bRow), p2)
    val (s1, s2) = (sigs(p1), sigs(p2))
    assert(s1.head._2 === s2.head._2, "counts agree by construction")
    assert(s1.head._3 === s2.head._3,
      "xor must cancel the duplicate pairs (the documented blind spot)")
    assert(s1.head._4 !== s2.head._4,
      "the second fold must catch the pair substitution")
  }

  test("q_pipe_manifest keeps NULL fields in the fingerprint") {
    import spark.implicits._
    // concat_ws would silently skip a NULL field (row still counted,
    // but fingerprinted as if the field were absent) — the injective
    // rendering must instead distinguish NULL from every real value,
    // including the empty string.
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT,text STRING,lang STRING,source STRING,n_chars BIGINT")
    def write(lang: String, dir: String) =
      spark.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row(1L, "x", lang, "s0", 5L)), schema)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def sig(dir: String) = q("q_pipe_manifest", dir).collect().head
    val base = java.nio.file.Files.createTempDirectory("graft_mfn0").toString
    val nul = java.nio.file.Files.createTempDirectory("graft_mfn1").toString
    val empty = java.nio.file.Files.createTempDirectory("graft_mfn2").toString
    write("en", base)
    write(null, nul)
    write("", empty)
    val (b, n, e) = (sig(base), sig(nul), sig(empty))
    assert(n.getLong(1) === 1L, "the NULL-field row must still be counted")
    assert(b.getLong(2) !== n.getLong(2), "NULL lang must change the sig")
    assert(n.getLong(2) !== e.getLong(2),
      "NULL must fingerprint differently from the empty string")
  }

  test("q_sample_weighted selects exactly the top-32 by the exponential-sort key") {
    import org.apache.spark.sql.functions.col
    // Independent driver-side recount of the Efraimidis–Spirakis key
    // over the whole corpus: md5-60bit uniform, ln(u)/w, floor-1e9
    // rounding, (key DESC, doc_id) order — the Spark result must be
    // exactly the first 32 of that total order.
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val all = graft.ops.Tables.t(spark, SparkTestBase.sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(_._3 > 0) // the query's w > 0 precondition guard
    val expect = all.map { case (id, lang, w) =>
      val u = (h60(id.toString) + 1).toDouble / 1.152921504606846976e18
      val key = math.floor(math.log(u) / w * 1e9 + 0.5) / 1e9
      (id, lang, w, key)
    }.sortBy { case (id, _, _, k) => (-k, id) }.take(32).toSeq
    val got = q("q_sample_weighted", SparkTestBase.sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expect)
    // Weight monotonicity of the key itself: at any fixed uniform, a
    // heavier doc ranks at least as high (ln u < 0, so dividing by a
    // larger w moves the key toward 0).
    val u0 = 0.37
    assert(math.log(u0) / 50 > math.log(u0) / 5)
  }

  test("q_pipe_temperature recounts exactly and tempers toward the rare languages") {
    // Full driver-side recount at sf0.001: per-language counts, the
    // sqrt(n_min/n_l) ppm threshold, and every hash-gated keep
    // decision must match the query bit-for-bit.
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = graft.ops.Tables.t(spark, SparkTestBase.sf0001, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val nByLang = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nMin = nByLang.values.min
    val ppm = nByLang.view.mapValues(n =>
      math.floor(math.sqrt(nMin.toDouble / n) * 1e6).toLong).toMap
    val expect = nByLang.keys.toSeq.sorted.map { lang =>
      val keptDocs = docs.filter(d => d._2 == lang &&
        h60(s"temp:${d._1}") % 1000000 < ppm(lang))
      (lang, nByLang(lang), ppm(lang),
        keptDocs.length.toLong, keptDocs.map(_._3).sum)
    }
    val got = q("q_pipe_temperature", SparkTestBase.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expect)
    // The tempering laws: the rarest language is kept in full, and
    // the threshold is strictly monotone decreasing in corpus share.
    val rarest = nByLang.minBy(_._2)._1
    assert(ppm(rarest) === 1000000L)
    val byN = nByLang.toSeq.sortBy(_._2).map(x => ppm(x._1))
    assert(byN === byN.sorted.reverse, s"ppm must fall as n grows: $byN")
  }

  test("q_pipe_cdc agg compaction equals window compaction, tombstones drop") {
    // The law behind the sort-free shape: per-key max_by over a
    // unique ordering key must equal the row_number-DESC window
    // survivor — the form that shuffles and sorts every row.
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    val ev = graft.ops.Tables.t(spark, SparkTestBase.sf0001, "events")
    val w = W.partitionBy($"user_id").orderBy($"ts".desc)
    val windowed = ev.withColumn("rn", row_number().over(w))
      .where($"rn" === 1 && $"event_type" =!= "error")
      .join(ev.groupBy($"user_id").agg(count(lit(1)).as("n_ops")),
        "user_id")
      .select($"user_id", $"n_ops", $"event_type".as("last_op"),
        (floor($"value" * 100 + 0.5) / 100).as("last_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).toSet
    val agg = q("q_pipe_cdc", SparkTestBase.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).toSet
    assert(agg === windowed)
    // The tombstone filter must actually fire: at least one user's
    // final op is an error at this fixture scale.
    val users = ev.select($"user_id").distinct().count()
    assert(agg.size < users, "some user must end tombstoned")
  }

  test("events.ts is globally unique at every fixture SF (cdc/interp ordering contract)") {
    // q_pipe_cdc's max_by and q_win_interp's ts-ordered windows are
    // deterministic across engines ONLY because no two events share a
    // ts: max_by vs DuckDB arg_max tie-break differently on
    // duplicates. This asserts the property the comments claim, so a
    // regenerated fixture with a duplicate ts fails HERE with a clear
    // message instead of as a silent differential flake.
    import org.apache.spark.sql.functions._
    Seq(SparkTestBase.sf0001, "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).isDirectory)
      .foreach { d =>
        val r = graft.ops.Tables.t(spark, d, "events")
          .agg(count(lit(1)).as("n"), count_distinct(col("ts")).as("nd"))
          .head
        assert(r.getLong(0) === r.getLong(1),
          s"$d/events: ${r.getLong(0)} rows but only ${r.getLong(1)} distinct ts " +
            "— cdc/interp ordering is no longer deterministic")
      }
  }

  test("q_pipe_dpnoise adds the exact deterministic Laplace draw per language") {
    val got = q("q_pipe_dpnoise", sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (lang, n, noisy) =>
      // Re-derive the draw on the driver: md5-60bit uniform → Laplace
      // inverse CDF at ε = 1, then the repo's 4-decimal floor.
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(lang.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(md5.take(15), 16).toDouble /
        1.152921504606846976e18
      val lap = -math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
      val expect = math.floor((n + lap) * 1e4 + 0.5) / 1e4
      assert(noisy === expect, s"lang=$lang")
      assert(noisy !== n.toDouble, s"the release must actually perturb $lang")
    }
  }

  test("q_sample_hash is a partition: every doc lands in exactly one split") {
    import spark.implicits._
    val perSplit = q("q_sample_hash", sf0001)
      .agg(sum($"n_docs")).collect()(0).getLong(0)
    val total = ops.Tables.t(spark, sf0001, "documents").count()
    assert(perSplit === total)
    // Split fractions near 80/10/10: md5 is uniform, 500 docs → the
    // train share must be nowhere near the 'everything in one split'
    // failure mode. Loose bounds on purpose (n=500).
    val train = q("q_sample_hash", sf0001).where($"split" === "train")
      .agg(sum($"n_docs")).collect()(0).getLong(0)
    assert(train > total * 0.7 && train < total * 0.9,
      s"train split $train/$total outside [0.7, 0.9]")
  }

  test("q_sample_hash assignment is stable under repartitioning and re-runs") {
    val a = q("q_sample_hash", sf0001).collect().map(_.toString).toSeq
    spark.conf.set("spark.sql.shuffle.partitions", "9")
    val b =
      try q("q_sample_hash", sf0001).collect().map(_.toString).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert(a === b)
  }

  test("q_sample_stratified caps every stratum at 20 and draws a true subset") {
    import spark.implicits._
    val s = q("q_sample_stratified", sf0001)
    val perLang = s.groupBy($"lang").count()
      .where($"count" > 20).count()
    assert(perLang === 0)
    val docs = ops.Tables.t(spark, sf0001, "documents")
      .select($"doc_id", $"lang")
    assert(s.join(docs, Seq("doc_id", "lang"), "left_anti").count() === 0,
      "sample must be a subset of the corpus")
  }

  test("q_join_skew_salt equals the plain unsalted join") {
    import spark.implicits._
    val salted = q("q_join_skew_salt", sf0001)
    val ev = ops.Tables.t(spark, sf0001, "events")
    val cust = ops.Tables.t(spark, sf0001, "customer")
    val plain = ev.join(cust, $"user_id" === $"c_custkey")
      .groupBy($"c_mktsegment").agg(
        count(lit(1)).as("n_events"),
        (floor(sum($"value") * 100 + 0.5) / 100).as("sum_value"))
      .orderBy($"c_mktsegment")
    assert(salted.collect().map(_.toString).toSeq ===
      plain.collect().map(_.toString).toSeq)
  }

  test("q_join_skew_salt joins on (key, salt), spreading hot keys") {
    val joins = q("q_join_skew_salt", sf0001).queryExecution.executedPlan
      .toString.linesIterator.filter(_.contains("Join")).mkString("\n")
    assert(joins.contains("salt"),
      s"join keys must include the salt column:\n$joins")
  }

  test("q_agg_pivot counts by explicit value list (micro: statuses F/O)") {
    // micro orders: cust1(BUILDING) has O+F, cust2(AUTOMOBILE) has F.
    val rows = q("q_agg_pivot", microDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      ("AUTOMOBILE", 1L, 0L, 0L),
      ("BUILDING", 1L, 1L, 0L)))
  }

  test("q_agg_quantile: singleton groups return the value itself (micro)") {
    val rows = q("q_agg_quantile", microDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(rows === Seq(("A", 100.0, 100.0), ("N", 50.0, 50.0),
      ("R", 300.0, 300.0)))
  }

  test("q_text_normalize collapses the micro fixture's exact-dup pair") {
    val rows = q("q_text_normalize", microDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(("en", 2L, 1L, 1L), ("fr", 1L, 1L, 0L)))
  }

  test("q_pipe_mix keeps every doc of a rate-100 source and a subset elsewhere") {
    // sf0.001: sources src0..src19, 25 docs each; rate is 100/50/25/10
    // by source index mod 4 — index%4==0 sources must keep all docs,
    // others at most their share's worth (hash-thinned, never more
    // than n_docs), and kept chars can't exceed kept docs * max chars.
    val rows = q("q_pipe_mix", SparkTestBase.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.size === 20)
    rows.foreach { case (src, nDocs, nKept) =>
      val idx = src.drop(3).toInt
      if (idx % 4 == 0) assert(nKept === nDocs, s"$src: rate-100 must keep all")
      else assert(nKept <= nDocs, s"$src: kept more than present")
    }
    // the mix must actually thin: total kept strictly below total docs
    assert(rows.map(_._3).sum < rows.map(_._2).sum)
  }

  test("q_agg_histogram buckets partition the rows and bound the values") {
    val rows = q("q_agg_histogram", SparkTestBase.sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val total = q("q_scan_count", SparkTestBase.sf0001).collect()
      .find(_.getString(0) == "lineitem").get.getLong(1)
    assert(rows.map(_._2).sum === total, "histogram must partition all rows")
    rows.foreach { case (b, _, mn, mx) =>
      assert(mn >= b * 5.0 && mx < (b + 1) * 5.0,
        s"bucket $b holds values outside [${b * 5}, ${b * 5 + 5})")
    }
  }

  test("q_pipe_upsert: change rows win, inserts land, untouched rows survive (micro)") {
    // micro customers: 1..4 with balances 100/200/200/50; none has
    // custkey % 7 == 0, so the only changes are the three NEW inserts.
    val rows = q("q_pipe_upsert", microDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows === Seq(
      ("AUTOMOBILE", 2L, 400.0), ("BUILDING", 2L, 150.0),
      ("NEW", 3L, 110.49)))
  }

  test("q_expr_struct groups by the (year, quarter) struct key (micro)") {
    val rows = q("q_expr_struct", microDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(
      (1996, 1, 1L, 100.0), (1996, 2, 1L, 200.0), (1997, 1, 1L, 300.0)))
  }

  test("q_pipe_expect: hard constraints hold, profile counts are non-vacuous") {
    val m = q("q_pipe_expect", sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("lineitem_qty_in_range_viol") === 0L)
    assert(m("lineitem_price_positive_viol") === 0L)
    assert(m("orders_custkey_orphans") === 0L)
    assert(m("profile_qty_above_45") > 0L, "profile row must be non-vacuous")
    assert(m("profile_disc_above_5pct") > 0L)
  }

  test("Observation collects audit metrics during the pass, no second job") {
    import org.apache.spark.sql.Observation
    import spark.implicits._
    val obs = Observation()
    val li = ops.Tables.t(spark, sf0001, "lineitem")
      .observe(obs, count(lit(1)).as("rows"),
        sum(when($"l_quantity" > 60, 1L).otherwise(0L)).as("viol"))
    val n = li.count()
    val m = obs.get
    assert(m("rows") === n, "observed row metric must match the action's count")
    assert(m("viol") === 0L)
  }

  test("q_pipe_pack conserves docs and tokens across bins") {
    import spark.implicits._
    val packed = q("q_pipe_pack", sf0001)
    val docs = ops.Tables.t(spark, sf0001, "documents")
    assert(packed.agg(sum($"n_docs")).collect()(0).getLong(0) === docs.count())
    val totTok = docs
      .select(sum(size(split($"text", " ")).cast("long")))
      .collect()(0).getLong(0)
    assert(packed.agg(sum($"n_tokens")).collect()(0).getLong(0) === totTok)
    // bins fill sequentially: ids are dense 0..max per lang
    val holes = packed.groupBy($"lang")
      .agg(min($"bin").as("lo"), max($"bin").as("hi"),
        count(lit(1)).as("n"))
      .where($"lo" =!= 0 || $"hi" =!= $"n" - 1)
    assert(holes.count() === 0, "bin ids must be dense from 0 per lang")
  }

  test("q_pipe_pack layout is invariant under repartitioning") {
    val a = q("q_pipe_pack", sf0001).collect().map(_.toString).toSeq
    spark.conf.set("spark.sql.shuffle.partitions", "9")
    val b =
      try q("q_pipe_pack", sf0001).collect().map(_.toString).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert(a === b)
  }

  test("q_pipe_wilson bounds bracket p_hat and tighten with n") {
    val rows = q("q_pipe_wilson", sf0001).collect()
      .map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, p, lo, hi) =>
      assert(lo <= p && p <= hi, s"interval must bracket p_hat ($lo, $p, $hi)")
      assert(lo >= 0.0 && hi <= 1.0, "Wilson bounds stay inside [0,1]")
      // rough z/sqrt(n) width sanity: 95% interval on n in the tens
      // can't be wider than ~2*0.98/sqrt(n) + rounding
      assert(hi - lo <= 2 * 0.98 / math.sqrt(n.toDouble) + 2e-4)
    }
  }

  test("q_pipe_abtest arms partition the events and the A/A t-stat is small") {
    import spark.implicits._
    val got = q("q_pipe_abtest", sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val totals = ops.Tables.t(spark, sf0001, "events")
      .groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (et, nt, nc, tstat) =>
      assert(nt + nc === totals(et), s"$et arms must partition the events")
      assert(nt > 0 && nc > 0)
      // a deterministic hash split of an i.i.d. fixture is an A/A
      // test: anything beyond |t| = 6 would mean the split is biased
      assert(math.abs(tstat) < 6.0, s"$et A/A t-stat $tstat")
    }
  }

  test("q_pipe_outlier matches an in-memory median/MAD recount") {
    import spark.implicits._
    val vals = ops.Tables.t(spark, sf0001, "events")
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val expect = vals.map { case (k, xs) =>
      val m = med(xs); val ma = med(xs.map(x => math.abs(x - m)))
      (k, xs.count(x => 0.6745 * math.abs(x - m) / ma > 3.5).toLong,
        xs.length.toLong)
    }.toSeq.sortBy(_._1)
    val got = q("q_pipe_outlier", sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expect)
  }

  test("q_pipe_chunk: stride-48 starts, widths in [1,64], count = ceil(n/48), full coverage") {
    import spark.implicits._
    val ch = q("q_pipe_chunk", sf0001)
    assert(ch.where($"start" % 48 =!= 0).count() === 0)
    assert(ch.where($"chunk_tokens" < 1 || $"chunk_tokens" > 64).count() === 0)
    val docs = ops.Tables.t(spark, sf0001, "documents").where($"doc_id" < 100)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tok"))
    val per = ch.groupBy($"doc_id").agg(
      count(lit(1)).as("n_chunks"),
      max($"start" + $"chunk_tokens").as("covered"))
    val j = per.join(docs, "doc_id")
    assert(j.where($"n_chunks" =!= ceil($"n_tok" / 48.0).cast("long")).count() === 0,
      "chunk count must be ceil(n_tok / stride)")
    assert(j.where($"covered" =!= $"n_tok").count() === 0,
      "the last chunk must reach the final token")
    assert(docs.join(per, Seq("doc_id"), "left_anti").count() === 0,
      "every doc (even a 1-token one) must produce at least one chunk")
  }

  test("q_pipe_scd2 intervals tile each user's timeline with one open end") {
    import spark.implicits._
    val rows = q("q_pipe_scd2", sf0001)
      .select($"user_id", $"valid_from", $"valid_to").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) null else r.getTimestamp(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (uid, rs) =>
      val sorted = rs.sortBy(_._2.getTime)
      assert(sorted.count(_._3 == null) === 1,
        s"user $uid must have exactly one open (current) interval")
      assert(sorted.last._3 == null, s"user $uid: open interval must be last")
      sorted.sliding(2).foreach {
        case Array((_, _, to), (_, from, _)) =>
          assert(to == from, s"user $uid: intervals must tile (valid_to == next valid_from)")
        case _ => ()
      }
    }
  }

  test("q_pipe_tokenbudget: plan spends at most the budget, arithmetic coheres") {
    val rows = q("q_pipe_tokenbudget", sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    assert(rows.length === 20, "one plan row per source")
    // flooring each allocation keeps the plan within the 1M budget
    assert(rows.map(_._5).sum <= 1000000L)
    assert(rows.map(_._5).sum >= 1000000L - rows.length,
      "each floor loses < 1 token")
    // shares and weights each sum to ~1 (4-decimal rounding slack)
    assert(math.abs(rows.map(_._3).sum - 1.0) <= 2e-3)
    assert(math.abs(rows.map(_._4).sum - 1.0) <= 2e-3)
    rows.foreach { case (src, tokens, _, _, planned, epochs) =>
      val exp = math.floor(planned.toDouble / tokens * 1e4 + 0.5) / 1e4
      assert(epochs === exp, s"$src: epochs must be planned/actual")
    }
  }

  /** Shared (lang, doc_id, score, label/rel) fixture for the
    * classifier-evaluation laws — the REAL scored table joined to the
    * deterministic reference columns the queries use. */
  private def scoredWith(extra: org.apache.spark.sql.Column,
      name: String): Array[(String, Long, Double, Double)] =
    ops.TextOps.classifyScored(spark, sf0001)
      .join(spark.read.parquet(s"$sf0001/documents.parquet")
        .select(col("doc_id"), extra.as(name)), "doc_id")
      .select(col("lang"), col("doc_id"), col("score"),
        col(name).cast("double"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))

  test("q_pipe_freshness: the freshest source reads zero; ages dominate staleness") {
    val rows = q("q_pipe_freshness", sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the corpus high-water mark belongs to SOME source → min staleness 0
    assert(rows.map(_._3).min === 0L, "freshest source must read 0")
    rows.foreach { case (t0, n, stale, avgAge) =>
      assert(n > 0 && stale >= 0, s"$t0")
      // every event is at least as old as the newest one the source
      // sent → the mean age dominates the staleness
      assert(avgAge >= stale, s"$t0: avg age $avgAge < staleness $stale")
    }
  }

  test("q_pipe_auc: midrank rank statistic equals brute-force pairwise AUC") {
    val data = scoredWith(
      when(col("n_chars") >= 300, 1).otherwise(0), "label")
    val out = q("q_pipe_auc", sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    data.groupBy(_._1).foreach { case (lang, rows) =>
      val pos = rows.filter(_._4 == 1.0).map(_._3)
      val neg = rows.filter(_._4 == 0.0).map(_._3)
      assert(pos.nonEmpty && neg.nonEmpty,
        s"fixture must carry both classes in $lang")
      // Pairwise Mann-Whitney wins (ties count half) — sums of exact
      // halves, so equality with the midrank form is exact, not
      // approximate.
      val wins = (for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      val brute =
        math.floor(wins / (pos.length.toDouble * neg.length) * 1e4 + 0.5) / 1e4
      assert(out(lang) === brute, s"lang=$lang")
    }
  }

  test("q_pipe_calibration: bins partition the corpus; confidence in-bin; gap coheres") {
    val rows = q("q_pipe_calibration", sf0001).collect()
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum === n, "bin counts partition the corpus")
    rows.foreach { r =>
      val (bin, conf, acc, gap) =
        (r.getInt(0), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(bin >= 0 && bin <= 9)
      // mean confidence must sit inside its own bin (5e-5 rounding slack)
      assert(conf >= bin / 10.0 - 5e-5 && conf <= (bin + 1) / 10.0 + 5e-5,
        s"bin $bin confidence $conf out of bin bounds")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(gap === math.floor(math.abs(conf - acc) * 1e4 + 0.5) / 1e4,
        s"bin $bin gap must be the rounded |conf - acc|")
    }
  }

  test("q_pipe_ndcg: brute-force DCG recount matches; ndcg bounded by 1") {
    val data = scoredWith(
      least(lit(3.0), floor(col("n_chars") / 150)), "rel")
    val out = q("q_pipe_ndcg", sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    data.groupBy(_._1).foreach { case (lang, rows) =>
      def dcgOf(order: Seq[(String, Long, Double, Double)]): Double =
        order.take(10).zipWithIndex.map { case (t, i) =>
          (math.pow(2.0, t._4) - 1.0) /
            (math.log(i + 2.0) / math.log(2.0))
        }.sum
      val dcg = dcgOf(rows.sortBy(t => (-t._3, t._2)).toSeq)
      val idcg = dcgOf(rows.sortBy(t => (-t._4, t._2)).toSeq)
      val (outDcg, outNdcg) = out(lang)
      // summation order differs from the distributed aggregate; allow
      // one 1e-4 grid step of slack around the recount
      assert(math.abs(outDcg - math.floor(dcg * 1e4 + 0.5) / 1e4) <= 1.01e-4,
        s"lang=$lang dcg10")
      assert(math.abs(outNdcg - math.floor(dcg / idcg * 1e4 + 0.5) / 1e4)
        <= 1.01e-4, s"lang=$lang ndcg10")
      assert(outNdcg <= 1.0 + 1e-9, s"lang=$lang ndcg must be ≤ 1")
    }
  }
}
