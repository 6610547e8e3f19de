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
}
