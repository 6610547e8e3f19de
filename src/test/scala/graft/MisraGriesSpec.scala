package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MisraGries

/** Laws of the Misra-Gries mergeable sketch (the guarantee
  * q_text_heavy's exactness rests on): candidate supersets survive any
  * partitioning/merge order, and undercounts stay within N/(k+1).
  */
class MisraGriesSpec extends AnyFunSuite {

  private def run(mg: MisraGries, items: Seq[String]): Map[String, Long] =
    items.foldLeft(mg.zero)(mg.reduce)

  test("reduce evicts via decrement-all when the buffer is full") {
    val mg = new MisraGries(2)
    // a a b -> {a:2, b:1}; c arrives with a full buffer -> all -1
    val b = run(mg, Seq("a", "a", "b", "c"))
    assert(b === Map("a" -> 1L))
  }

  test("merge evicts by the (k+1)-th largest count") {
    val mg = new MisraGries(2)
    val merged = mg.merge(Map("a" -> 5L, "b" -> 2L), Map("c" -> 3L, "b" -> 1L))
    // combined {a:5, b:3, c:3}: 3rd largest = 3 -> subtract, keep > 0
    assert(merged === Map("a" -> 2L))
  }

  test("theta-heavy items survive any partitioning and merge order") {
    val rnd = new scala.util.Random(42)
    val k = 9 // k+1 = 10 > 1/theta for theta = 0.15
    // 'hot' at ~30% > theta; 40 cold keys share the rest
    val data = rnd.shuffle(Seq.fill(300)("hot") ++
      (0 until 700).map(i => s"cold${i % 40}"))
    for (nParts <- Seq(1, 3, 7, 16)) {
      val mg = new MisraGries(k)
      val partials = data.grouped(math.max(1, data.size / nParts))
        .map(chunk => run(mg, chunk)).toSeq
      val summary = rnd.shuffle(partials).foldLeft(mg.zero)(mg.merge)
      assert(summary.contains("hot"), s"heavy item lost at nParts=$nParts")
      assert(summary.size <= k, "buffer must never exceed k entries")
      // MG undercount bound: stored count >= true count - N/(k+1)
      assert(summary("hot") >= 300L - data.size / (k + 1))
    }
  }

  test("exact when the key domain fits the buffer") {
    val mg = new MisraGries(64)
    val data = Seq.fill(10)("x") ++ Seq.fill(5)("y") ++ Seq("z")
    assert(run(mg, data) === Map("x" -> 10L, "y" -> 5L, "z" -> 1L))
  }
}
