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
  * Streaming-only by design: in batch mode Spark discards state and
  * ignores timeouts, so the final open session of each key would never
  * emit — hence this is not a declared oracle query; StreamySpec
  * asserts it against `session_window` under MemoryStream.
  */
object CustomSessions {
  val GapMs: Long = 30L * 60 * 1000

  def sessionize(events: Dataset[SessEvent]): Dataset[Session] = {
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
            Iterator(Session(user, new Timestamp(st.start), st.n))
          } else {
            // batch arrival order is arbitrary; session logic needs
            // event-time order within the micro-batch
            val sorted = evs.map(_.ts.getTime).toSeq.sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { tMs =>
              cur = cur match {
                case Some(st) if tMs - st.last < GapMs =>
                  Some(st.copy(last = tMs, n = st.n + 1))
                case Some(st) =>
                  closed ::= Session(user, new Timestamp(st.start), st.n)
                  Some(SessState(tMs, tMs, 1))
                case None =>
                  Some(SessState(tMs, tMs, 1))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.last + GapMs)
            }
            closed.reverse.iterator
          }
      }
  }
}
