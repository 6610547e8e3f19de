package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

case class HwEvent(user_id: Long, event_id: Long, ts: Timestamp, value: Double)

/** Per-user HIGH-WATER-MARK filter through `transformWithState` — the
  * Spark 4.x arbitrary-state API v2 (StatefulProcessor + typed state
  * handles) that supersedes `flatMapGroupsWithState`: emit exactly the
  * events that set a new per-user maximum value. The running max lives
  * in a `ValueState[Double]` (the new API's point: state is a typed,
  * named handle — add a ListState/MapState without touching the
  * tuple-encoded blob fMGWS forces, and TTL is declarative per state).
  *
  * Batch mode invokes `handleInputRows` once per key with all its
  * rows and empty state, so the batch output is exactly the
  * running-max SQL the DuckDB oracle replays; cross-micro-batch state
  * persistence is pinned under MemoryStream in StreamySpec. Rows are
  * event-time-ordered WITHIN an invocation (arrival order is the
  * cross-batch order in streaming — the documented semantics of any
  * arrival-dependent stateful filter). TimeMode.None + no TTL keeps
  * the operator deterministic.
  */
class HighWater extends StatefulProcessor[Long, HwEvent, HwEvent] {
  @transient private var mx: org.apache.spark.sql.streaming.ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    mx = getHandle.getValueState[Double]("mx", Encoders.scalaDouble,
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[HwEvent],
      timerValues: TimerValues): Iterator[HwEvent] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    var cur = if (mx.exists()) mx.get() else Double.NegativeInfinity
    val out = Seq.newBuilder[HwEvent]
    sorted.foreach { e =>
      if (e.value > cur) { cur = e.value; out += e }
    }
    mx.update(cur)
    out.result().iterator
  }
}

object HighWater {
  /** BATCH transformWithState reads state through the driver's
    * StateStoreCoordinator, but only STREAMING queries create it
    * (StreamExecution touches the manager's lazy val) — a pure-batch
    * session fails CANNOT_LOAD_STATE_STORE / RpcEndpointNotFound.
    * Touch the same lazy val the streaming path uses; reflection only
    * because the accessor is private[sql] at source level (public in
    * bytecode — this is the supported creation path, not a fork).
    * Shared by every batch-TWS caller (HighWater, TrailState). */
  private[streaming] def touchCoordinator(
      spark: org.apache.spark.sql.SparkSession): Unit = {
    val mgr = spark.streams
    try mgr.getClass.getMethod("stateStoreCoordinator").invoke(mgr)
    catch {
      case e: ReflectiveOperationException =>
        // Fail loudly with the WHY, not per-batch CANNOT_LOAD_STATE_STORE
        // noise (r12 advice): pinned against Spark 4.1's
        // StreamingQueryManager#stateStoreCoordinator (private[sql] at
        // source, public in bytecode). On upgrade, re-locate the lazy
        // coordinator-creating accessor or use a supported batch-TWS
        // init path if one has appeared.
        throw new IllegalStateException(
          "graft.streaming: could not initialize the driver " +
          "StateStoreCoordinator via StreamingQueryManager#" +
          "stateStoreCoordinator (reflection; verified on Spark 4.1). " +
          "Batch transformWithState needs it created before first use — " +
          "check the accessor name in this Spark version.", e)
    }
  }

  /** Expects a typed Dataset[HwEvent]; keyed on user_id. */
  def marks(events: Dataset[HwEvent]): Dataset[HwEvent] = {
    import events.sparkSession.implicits._
    touchCoordinator(events.sparkSession)
    events.groupByKey(_.user_id)
      .transformWithState(new HighWater, TimeMode.None(), OutputMode.Append())
  }
}
