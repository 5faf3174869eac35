package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One event of the session stream: the q136 projection of `events`. */
final case class SessionEvent(userId: Long, us: Long, eventId: Long)

/** One event's session assignment. */
final case class SessionAssign(userId: Long, eventId: Long, sessionId: Long)

/** Streaming twin of q136's gaps-and-islands sessionization
  * (EventQueries.scala q136): events are assigned 1-based per-user session
  * ids incrementally — a session breaks when the gap to the user's previous
  * event exceeds `gapUs` — instead of by a lag+running-sum window over the
  * full history.
  *
  * State per user is (last event time, current session id) in a
  * `transformWithState` ValueState (RocksDB-backed, checkpoint-durable):
  * O(1) bytes per user regardless of history length — the batch query
  * re-windows all history every run, the stream pays each event once (the
  * [[FunnelTrigramProcessor]] posture). The break predicate is literally
  * q136's `is_new` (`prev IS NULL OR us - prev > gap`) and ids are its
  * running sum, so batch and stream agree event-for-event on replayed
  * history (StreamingSessionizeSpec pins the parity).
  *
  * Ordering contract (same as the funnel twin): intra-batch rows are
  * sorted by (us, event_id) — q136's total order — repairing arrival
  * shuffles; across batches per-user order must be non-decreasing (the
  * ordered-log ingest shape, reference lambda_function.py:140-141). A
  * session OPEN at a batch boundary continues; it never closes early,
  * because closing needs only the NEXT event's gap, carried by state. */
class SessionizeProcessor(gapUs: Long)
    extends StatefulProcessor[Long, SessionEvent, SessionAssign] {
  @transient private var st: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)](
      "sess", Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[SessionEvent],
      timerValues: TimerValues): Iterator[SessionAssign] = {
    val ordered = rows.toArray.sortBy(e => (e.us, e.eventId))
    var (lastUs, sid) = if (st.exists()) st.get() else (Long.MinValue, 0L)
    val out = Vector.newBuilder[SessionAssign]
    ordered.foreach { e =>
      if (lastUs == Long.MinValue || e.us - lastUs > gapUs) sid += 1
      lastUs = e.us
      out += SessionAssign(key, e.eventId, sid)
    }
    st.update((lastUs, sid))
    out.result().iterator
  }
}

object StreamingSessionize {
  /** Event stream → per-event (user, event, session id) assignments;
    * session-level aggregates compose downstream exactly as in q136. */
  def assign(events: Dataset[SessionEvent],
      gapUs: Long = 1800L * 1000000L): Dataset[SessionAssign] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new SessionizeProcessor(gapUs), TimeMode.None(),
        OutputMode.Append())
  }
}
