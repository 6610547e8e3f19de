package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ExpiredTimerInfo}

case class TrailEvent(user_id: Long, event_id: Long, ts: Timestamp,
                      event_type: String, value: Double)

/** Per-user rolling summary: lifetime counts, the dominant event type,
  * and the sum of the LAST-3 events by event time. */
case class TrailSummary(user_id: Long, n_events: Long, n_types: Int,
                        top_type: String, top_n: Long, last3_sum: Double,
                        by_timer: Boolean)

/** The transformWithState MULTI-STATE surface — the part of the v2
  * arbitrary-state API that `q_stream_tws`'s ValueState row doesn't
  * exercise (and the API's main selling point over
  * flatMapGroupsWithState): several TYPED, NAMED state handles per
  * key, each independently evolvable, plus TIMERS.
  *
  *  - `last3: ListState[(tsMicros, event_id, value)]` — the last-3
  *    events by event time, TRIMMED on every invocation so state per
  *    key is O(3) regardless of stream length (the bounded-trail
  *    pattern a per-user feature store keeps).
  *  - `counts: MapState[String, Long]` — lifetime event count per
  *    event type (point-updatable per incoming row: the RocksDB
  *    provider reads/writes ONE map entry per row, never the whole
  *    blob — exactly what fMGWS's single tuple state cannot do).
  *  - Timers (streaming only, `emitOnInput = false`): each batch of
  *    input re-arms one event-time timer at max(event ts) + gap; the
  *    summary row is EMITTED by `handleExpiredTimer` when the
  *    watermark passes it — the flush-on-inactivity shape. Pinned
  *    cross-batch in StreamySpec.
  *
  * Batch mode (`emitOnInput = true`, TimeMode.None) invokes each key
  * once over all its rows with empty state and emits the summary
  * directly, so the declared row `q_stream_tws_list` is exactly the
  * grouped SQL the DuckDB oracle replays.
  */
class TrailWindow(emitOnInput: Boolean, timerGapMs: Long = 0L)
    extends StatefulProcessor[Long, TrailEvent, TrailSummary] {

  @transient private var last3: ListState[(Long, Long, Double)] = _
  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    last3 = getHandle.getListState[(Long, Long, Double)]("last3",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaDouble), TTLConfig.NONE)
    counts = getHandle.getMapState[String, Long]("counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  private def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + (t.getNanos / 1000L) % 1000L

  private def summary(key: Long, byTimer: Boolean): TrailSummary = {
    val cs = counts.iterator().toSeq
    // Dominant type: max count, lexicographically-first tie-break —
    // deterministic, mirrored by the oracle's ORDER BY n DESC, type.
    val (topT, topN) = cs.minBy { case (t, c) => (-c, t) }
    // Ascending event-time order so the 3-term double sum has ONE
    // defined operand order (the oracle floors to the same 4dp grid).
    val l3 = last3.get().toSeq.sortBy(e => (e._1, e._2))
    TrailSummary(key, cs.map(_._2).sum, cs.size, topT, topN,
      l3.map(_._3).sum, byTimer)
  }

  override def handleInputRows(key: Long, rows: Iterator[TrailEvent],
      timerValues: TimerValues): Iterator[TrailSummary] = {
    val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    sorted.foreach { e =>
      val c = if (counts.containsKey(e.event_type))
        counts.getValue(e.event_type) else 0L
      counts.updateValue(e.event_type, c + 1L)
    }
    val merged =
      ((if (last3.exists()) last3.get().toSeq else Seq.empty) ++
        sorted.map(e => (micros(e.ts), e.event_id, e.value)))
        .sortBy(x => (x._1, x._2)).takeRight(3)
    last3.put(merged.toArray)
    if (!emitOnInput) {
      // One armed timer per key: re-arm at this batch's max event time
      // + gap (flush-on-inactivity). listTimers is O(timers per key)=1.
      getHandle.listTimers().foreach(ts =>
        getHandle.deleteTimer(ts.asInstanceOf[Long]))
      getHandle.registerTimer(sorted.map(_.ts.getTime).max + timerGapMs)
      Iterator.empty
    } else Iterator.single(summary(key, byTimer = false))
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[TrailSummary] =
    Iterator.single(summary(key, byTimer = true))
}

object TrailState {
  /** Batch form — one summary per user, emitted inline (timers off).
    * Keyed on user_id; see [[TrailWindow]] for the state layout. */
  def summaries(events: Dataset[TrailEvent]): Dataset[TrailSummary] = {
    import events.sparkSession.implicits._
    HighWater.touchCoordinator(events.sparkSession)
    events.groupByKey(_.user_id)
      .transformWithState(new TrailWindow(emitOnInput = true),
        TimeMode.None(), OutputMode.Append())
  }
}
