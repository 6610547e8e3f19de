package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SimHash signature aggregate: folds 60-bit token hashes into the
  * packed signature `Σ_j (popcount-vote_j > 0) << j` in one pass.
  *
  * Replaces the declarative form — explode(tokens) → 60 separate
  * `sum(when(bit_j, 1).otherwise(-1))` agg columns → re-pack — whose
  * generated aggregate class was the single largest janino compile in
  * the bench (~1.7 s cold at sf0.1). The integer math is identical
  * bit-for-bit: per token, bit j set contributes +1 else -1 (a null
  * hash contributes -1 on every bit, matching `when`'s null→otherwise
  * semantics); signature bit j is set iff the count is > 0.
  *
  * Buffer is a primitive long[60]; merge is element-wise add, so the
  * aggregation is partial+final (map-side combine) and scale-safe —
  * one 480-byte buffer per (doc) group per partition in flight.
  */
class SimHashAggregator(bits: Int)
    extends Aggregator[java.lang.Long, Array[Long], Long] {

  override def zero: Array[Long] = new Array[Long](bits)

  override def reduce(buf: Array[Long], h: java.lang.Long): Array[Long] = {
    val v: Long = if (h == null) 0L else h.longValue()
    // null → v=0 → every bit clear → -1 per bit, same as when(...).otherwise(-1)
    var j = 0
    while (j < bits) {
      buf(j) += (if (((v >> j) & 1L) == 1L) 1L else -1L)
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < bits) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (buf(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Long] =
    Encoders.scalaLong
}
