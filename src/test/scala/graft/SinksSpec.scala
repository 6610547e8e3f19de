package graft

import org.apache.spark.sql.functions._
import SparkTestBase.sf0001

/** Sink-side discipline for cluster-scale output (SURVEY §2.1 sinks):
  * partitioned layout with partition-pruned read-back, bucketed tables
  * that make the downstream join shuffle-free, and file-count control.
  * These are the write-path properties that decide whether a 100 TB
  * dataset is queryable afterwards.
  */
class SinksSpec extends GraftSuite {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("DirSink commit protocol: orphans invisible, aborts leave no visible output") {
    val s = spark
    import s.implicits._
    // 1. Committed write: manifest lists every part, counts add up.
    val dir = tmp("graft_dirsink")
    s.range(100).select($"id", ($"id" * 2.0).as("v"))
      .repartition(4, $"id")
      .write.format("graft.sources.DirSink").option("path", dir)
      .mode("append").save()
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "_MANIFEST")).split("\n").filter(_.nonEmpty)
    assert(manifest.length === 4)
    assert(manifest.map(_.split("\\|")(1).toLong).sum === 100L)
    // 2. Orphan part (a task whose commit message was lost): a
    // manifest-driven reader must never see it.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-99999.txt"), "666|1332.0\n")
    val listed = manifest.map(l => s"$dir/${l.split("\\|")(0)}")
    val got = s.read.text(listed: _*)
      .select(split($"value", "\\|")(0).cast("long").as("id"))
    assert(got.count() === 100L)
    assert(got.where($"id" === 666L).count() === 0L, "orphan leaked")
    // 3. Aborted job: a mid-write failure must leave NO new committed
    // output — no temp files and no manifest in the fresh dir.
    val dir2 = tmp("graft_dirsink_abort")
    val boom = s.range(100).select($"id",
      when($"id" === 57L, expr("raise_error('boom')")).otherwise($"id" * 1.0)
        .as("v"))
    intercept[Exception] {
      boom.repartition(4, $"id")
        .write.format("graft.sources.DirSink").option("path", dir2)
        .mode("append").save()
    }
    val left = new java.io.File(dir2).list().toSeq
    assert(!left.contains("_MANIFEST"), "aborted job must not commit")
    assert(!left.exists(_.endsWith(".tmp")),
      s"abort must clean temp files, found $left")
  }

  test("partitionBy(lang) write prunes partitions on read-back") {
    import spark.implicits._
    val dir = tmp("graft_part") + "/docs"
    ops.Tables.t(spark, sf0001, "documents")
      .write.partitionBy("lang").parquet(dir)
    // Layout: one lang=<v> directory per language.
    val langDirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang="))
    assert(langDirs.length >= 2)
    // Read back with a partition predicate: the scan must report the
    // filter as a PartitionFilter (pruned at planning, no data read
    // from other languages), not a post-scan Filter.
    val back = spark.read.parquet(dir).where($"lang" === "en")
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("lang"),
      s"lang predicate must prune partitions:\n$scan")
    assert(back.count() ===
      ops.Tables.t(spark, sf0001, "documents").where($"lang" === "en").count())
  }

  test("bucketed tables co-locate the join: no Exchange between scans") {
    import spark.implicits._
    try {
      ops.Tables.t(spark, sf0001, "orders")
        .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("graft_orders_b")
      ops.Tables.t(spark, sf0001, "customer")
        .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("graft_cust_b")
      // Disable broadcast so the planner must choose between shuffle
      // and bucket co-location — the whole point of bucketing.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_orders_b")
        .join(spark.table("graft_cust_b"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").count()
      val plan = j.queryExecution.executedPlan.toString
      val joinSection = plan.linesIterator
        .dropWhile(l => !l.contains("SortMergeJoin")).mkString("\n")
      assert(plan.contains("SortMergeJoin"))
      assert(!joinSection.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_cust_b")
    }
  }

  test("maxRecordsPerFile bounds output file size") {
    import spark.implicits._
    val dir = tmp("graft_files") + "/li"
    ops.Tables.t(spark, sf0001, "lineitem")
      .repartition(1) // single task → file count driven by the option
      .write.option("maxRecordsPerFile", 1000).parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 6, // 6000 rows / 1000 per file
      s"expected >=6 files, got ${files.length}")
    assert(spark.read.parquet(dir).count() === 6000)
  }

  test("dynamic partition overwrite replaces only touched partitions") {
    import spark.implicits._
    val dir = tmp("graft_dyn") + "/docs"
    val docs = ops.Tables.t(spark, sf0001, "documents")
      .select($"doc_id", $"lang")
    docs.write.partitionBy("lang").parquet(dir)
    val before = spark.read.parquet(dir).count()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // Overwrite ONLY lang=en with a single sentinel row; other
      // languages must survive untouched.
      Seq((-1L, "en")).toDF("doc_id", "lang")
        .write.mode("overwrite").partitionBy("lang").parquet(dir)
      val after = spark.read.parquet(dir)
      assert(after.where($"lang" === "en").count() === 1)
      assert(after.where($"lang" =!= "en").count() ===
        docs.where($"lang" =!= "en").count())
      assert(after.count() < before)
    } finally {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    }
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    import spark.implicits._
    val dir = tmp("graft_dpp") + "/orders"
    ops.Tables.t(spark, sf0001, "orders")
      .write.partitionBy("o_orderstatus").parquet(dir)
    val fact = spark.read.parquet(dir)
    // The status filter lives on the DIM side only — static pruning
    // can't see it; DPP must push the broadcast result into the fact
    // scan's partition filters at runtime. This is the 100-TB
    // star-join shape: fact partitioned on the join key's domain.
    // The dim must be a FILE source with a surviving filter predicate:
    // a filtered LocalRelation constant-folds away and DPP's
    // selective-predicate check never fires.
    val dimDir = tmp("graft_dpp_dim") + "/dim"
    Seq(("F", "finished"), ("X", "unused"))
      .toDF("status", "label").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir).where($"label" === "finished")
    val joined = fact.join(dim, $"o_orderstatus" === $"status")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan must carry a dynamicpruning partition filter:\n$plan")
    assert(joined.count() ===
      ops.Tables.t(spark, sf0001, "orders")
        .where($"o_orderstatus" === "F").count())
  }

  test("z-order write bounds BOTH dimensions per file; linear sort only one") {
    import spark.implicits._
    import graft.functions.ZOrder.zval
    // Lay the same lineitem projection out twice — linear (orderkey)
    // vs z-order(orderkey, partkey) — splitting the sorted stream into
    // many small files. Per-file min-max ranges then stand in for the
    // footer stats a scan would prune on.
    val src = ops.Tables.t(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_linenumber")
    def layout(sortCols: Seq[org.apache.spark.sql.Column]): Array[(Long, Long, Long, Long)] = {
      val dir = tmp("graft_zorder") + "/li"
      src.coalesce(1).sortWithinPartitions(sortCols: _*)
        .write.option("maxRecordsPerFile", 250).parquet(dir)
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
        .map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min($"l_orderkey"), max($"l_orderkey"),
                 min($"l_partkey"), max($"l_partkey")).collect()(0)
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }
    }
    val lin = layout(Seq($"l_orderkey", $"l_linenumber"))
    val zed = layout(Seq(
      zval($"l_orderkey", $"l_partkey", 16), $"l_orderkey", $"l_linenumber"))
    assert(lin.length > 8 && zed.length > 8, "need enough files to measure pruning")
    // 2-D box predicate: bottom quarter of each dimension. A file is
    // "hit" when its [min,max] box intersects the predicate box.
    val (okMax, pkMax) = (lin.map(_._2).max, lin.map(_._4).max)
    def hits(fs: Array[(Long, Long, Long, Long)]): Int =
      fs.count { case (okMin, okMx, pkMin, pkMx) =>
        okMin <= okMax / 4 && pkMin <= pkMax / 4 }
    val (hLin, hZed) = (hits(lin), hits(zed))
    assert(hZed < hLin,
      s"z-order must prune more files on a 2-D box: z=$hZed linear=$hLin of ${lin.length}")
  }
}
