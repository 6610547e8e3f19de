package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed [[Aggregator]] — the
  * mergeable-summary surface of the engine (same family as
  * `approx_count_distinct`'s HLL++): each partition maintains at most
  * `k` counters; merging sums counters then evicts by the (k+1)-th
  * largest count, which preserves the MG error bound (undercount
  * ≤ N/(k+1), Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * Guarantee used by `q_text_heavy`: every item with true frequency
  * > N/(k+1) survives the sketch, so with k+1 > 1/θ the candidate set
  * is a SUPERSET of the θ-heavy hitters regardless of row order or
  * partitioning — an exact recount of the candidates then makes the
  * final answer deterministic and oracle-checkable.
  *
  * At 100 TB this is the right shape: the shuffle carries one k-entry
  * summary per partition instead of the full key domain, and the
  * second (verify) pass is a broadcast semi join + keyed count over
  * only the ≤ k candidates.
  *
  * Output is the sorted candidate list joined with '\u0001' (a String,
  * so the result stays in a columnar-friendly type without a custom
  * encoder for Seq).
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], String] {
  require(k > 0)

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], w: String): Map[String, Long] =
    b.get(w) match {
      case Some(c) => b.updated(w, c + 1L)
      case None if b.size < k => b.updated(w, 1L)
      case None =>
        // Decrement-all: drops every counter by 1, evicting zeros —
        // the arriving item is "cancelled" against k existing ones.
        b.flatMap { case (key, c) => if (c > 1L) Some(key -> (c - 1L)) else None }
    }

  def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val combined = y.foldLeft(x) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // Evict by the (k+1)-th largest count (Mergeable Summaries §3.1):
      // subtract it from every counter, keep strictly-positive ones.
      val d = combined.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(k)
      combined.flatMap { case (w, c) => if (c > d) Some(w -> (c - d)) else None }
    }
  }

  def finish(b: Map[String, Long]): String =
    b.keysIterator.toSeq.sorted.mkString("\u0001")

  def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  def outputEncoder: Encoder[String] = Encoders.STRING
}
