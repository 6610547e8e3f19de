package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

case class SessEvent(user_id: Long, ts: Timestamp)
case class SessState(start: Long, last: Long, n: Long)
case class Session(user_id: Long, session_start: Timestamp, n_events: Long)

/** Custom sessionization with explicit state — the
  * `flatMapGroupsWithState` surface for logic `session_window` can't
  * express (per-session custom merge rules, early emission, side
  * effects on close). Semantics match `session_window(ts, 30 minutes)`:
  * an event extends the open session while its gap from the previous
  * event is strictly under 30 minutes; otherwise the open session
  * closes and a new one starts. Sessions are emitted when the
  * event-time watermark passes `last + gap` (EventTimeTimeout), so
  * state is bounded by the watermark — the property that keeps this
  * runnable forever on an unbounded stream.
  *
  * Two modes share the one state-transition function:
  *  - `flushAtEnd = false` (streaming): the open session stays in
  *    `GroupState` and emits when the event-time watermark passes
  *    `last + gap` (EventTimeTimeout) — state is bounded by the
  *    watermark, the property that keeps this runnable forever on an
  *    unbounded stream. StreamySpec pins cross-batch merge, timeout
  *    close, and single-emission (state evicted on emit) under
  *    MemoryStream.
  *  - `flushAtEnd = true` (batch, the declared `q_stream_custom_state`
  *    row): batch mode calls the function exactly once per key with
  *    ALL its events and then DISCARDS state and ignores timeouts, so
  *    the final open session would otherwise never emit; flushing it
  *    at iterator end makes the batch output the complete
  *    sessionization — exactly the gaps-and-islands SQL the DuckDB
  *    oracle replays.
  */
object CustomSessions {
  val GapMs: Long = 30L * 60 * 1000
  private val GapUs: Long = GapMs * 1000

  // State arithmetic runs in epoch MICROS — `Timestamp.getTime` alone
  // (millis) silently truncates the fixture's microsecond event times,
  // which shifted every session_start by sub-millisecond amounts
  // against the oracle.
  private def usOf(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000L))
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def sessionize(events: Dataset[SessEvent],
                 flushAtEnd: Boolean = false): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, evs, state) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(Session(user, tsOf(st.start), st.n))
          } else {
            // batch arrival order is arbitrary; session logic needs
            // event-time order within the micro-batch
            val sorted = evs.map(e => usOf(e.ts)).toSeq.sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { tUs =>
              cur = cur match {
                case Some(st) if tUs - st.last < GapUs =>
                  Some(st.copy(last = tUs, n = st.n + 1))
                case Some(st) =>
                  closed ::= Session(user, tsOf(st.start), st.n)
                  Some(SessState(tUs, tUs, 1))
                case None =>
                  Some(SessState(tUs, tUs, 1))
              }
            }
            if (flushAtEnd) {
              // Batch: this is the key's only invocation — the open
              // session is final. Don't touch timeout plumbing (batch
              // ignores it anyway).
              cur.foreach { st =>
                closed ::= Session(user, tsOf(st.start), st.n)
              }
            } else {
              cur.foreach { st =>
                state.update(st)
                // setTimeoutTimestamp takes epoch MILLIS; round the
                // micro-precision close time UP so the timeout never
                // fires a fraction of a millisecond early.
                state.setTimeoutTimestamp(
                  math.floorDiv(st.last + GapUs + 999L, 1000L))
              }
            }
            closed.reverse.iterator
          }
      }
  }
}
