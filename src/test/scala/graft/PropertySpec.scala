package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based laws (SURVEY §5.3) over scalacheck-generated inputs.
  * The scalatest-scalacheck bridge isn't on the offline classpath, so
  * Gens are driven by hand from fixed seeds — deterministic cases,
  * a few per law since every case runs a Spark job.
  */
class PropertySpec extends GraftSuite {

  private val intLists = Gen.listOf(Gen.chooseNum(-50, 50))

  private def cases(n: Int): Seq[List[Int]] =
    (0 until n).map { i =>
      intLists(Gen.Parameters.default.withSize(40), Seed(i.toLong * 7919))
        .getOrElse(Nil)
    }

  test("set-op cardinality law: |A ∪ B| = |A| + |B| - |A ∩ B| (distinct)") {
    val s = spark
    import s.implicits._
    cases(5).zip(cases(5).reverse).foreach { case (xs, ys) =>
      val a = xs.toDF("v")
      val b = ys.toDF("v")
      val union = a.union(b).distinct().count()
      val inter = a.intersect(b).count()
      assert(union === a.distinct().count() + b.distinct().count() - inter,
        s"law failed for |A|=${xs.size}, |B|=${ys.size}")
    }
  }

  test("dedup idempotence: dedup(dedup(x)) == dedup(x)") {
    val s = spark
    import s.implicits._
    cases(5).foreach { xs =>
      val once = xs.toDF("v").dropDuplicates("v")
      assert(once.dropDuplicates("v").count() === once.count())
    }
  }

  test("char_bigram_counts law: equals naive sliding-window counting") {
    val s = spark
    import s.implicits._
    val strGen = Gen.listOfN(30, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)
    val strs = (0 until 8).flatMap(i =>
      strGen(Gen.Parameters.default, Seed(i.toLong * 104729)).toSeq) :+ "" :+ "q"
    val got = strs.toDF("t")
      .selectExpr("t", "char_bigram_counts(t) AS e").collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getString(0), x.getLong(1))).toSeq).toMap
    strs.foreach { t =>
      val want = t.sliding(2).filter(_.length == 2).toSeq
        .groupBy(identity).map { case (bg, o) => (bg, o.size.toLong) }
        .toSeq.sortBy(_._1)
      assert(got(t) === want, s"mismatch for input '$t'")
      assert(got(t).map(_._2).sum === math.max(0, t.length - 1).toLong,
        "multiplicities must sum to len-1")
    }
  }

  test("top-k is the prefix of the total sort") {
    val s = spark
    import s.implicits._
    cases(5).foreach { xs =>
      val sorted = xs.toDF("v").orderBy($"v".desc).collect().map(_.getInt(0))
      val topk = xs.toDF("v").orderBy($"v".desc).limit(5)
        .collect().map(_.getInt(0))
      assert(topk.toSeq === sorted.take(5).toSeq)
    }
  }

  test("zval law: Morton interleave is injective and matches bit-math reference") {
    val s = spark
    import s.implicits._
    import graft.functions.ZOrder.zval
    def ref(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1L) << (2 * i)) |
        (((b >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val pts = for (a <- 0L to 40L by 7; b <- 0L to 40L by 5) yield (a, b)
    val got = pts.toDF("a", "b")
      .select($"a", $"b", zval($"a", $"b", 16).as("z")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    got.foreach { case ((a, b), z) =>
      assert(z === ref(a, b), s"zval($a,$b)") }
    assert(got.map(_._2).distinct.length === got.length, "zval must be injective")
  }

  test("upsert idempotence: applying the same change-batch twice equals once") {
    val s = spark
    import s.implicits._
    def merge(base: org.apache.spark.sql.DataFrame,
              ch: org.apache.spark.sql.DataFrame) =
      base.join(ch.select($"k", $"v".as("cv")), $"id" === $"k", "full_outer")
        .select(org.apache.spark.sql.functions.coalesce($"k", $"id").as("id"),
          org.apache.spark.sql.functions.coalesce($"cv", $"v").as("v"))
    cases(4).foreach { xs =>
      val base = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val ch = xs.zipWithIndex.collect {
        case (v, i) if i % 3 == 0 => (i.toLong, v + 1000)
      }.toDF("k", "v")
      val once = merge(base, ch)
      val twice = merge(once, ch)
      assert(twice.orderBy($"id").collect().toSeq ===
        once.orderBy($"id").collect().toSeq)
    }
  }
}
