package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One event of the funnel stream: the q128 projection of `events`
  * (user, event-time microseconds, id for total-order tie-break, type). */
final case class FunnelEvent(userId: Long, us: Long, eventId: Long, eventType: String)

/** One mined 3-step transition, keyed back to the user that walked it. */
final case class FunnelTrigram(userId: Long, trigram: String)

/** Streaming twin of q128's event-sequence trigram mining
  * (EventQueries.scala q128): per user, every 3-step event-type transition,
  * mined incrementally as events arrive instead of from a window over the
  * full history.
  *
  * State per user is the sequence TAIL — the last two event types — in a
  * `transformWithState` ValueState (RocksDB-backed, checkpoint-durable,
  * same scale posture as [[RunningCountProcessor]]): O(1) bytes per user
  * regardless of history length, which is what makes the streaming
  * formulation preferable at 100 TB — the batch query re-windows the whole
  * history every run, the stream pays each event exactly once.
  *
  * A trigram that SPANS micro-batches (two events in batch N, the third in
  * batch N+1) is emitted because the tail carries across batches — the
  * cross-batch sequence-continuation property StreamingFunnelSpec pins.
  *
  * Ordering contract: within a micro-batch the processor sorts each user's
  * rows by (us, event_id) — the identical total order q128's window uses —
  * so any intra-batch arrival shuffle is repaired. ACROSS batches events
  * must arrive non-decreasing in that order per user (the replay/ingest
  * shape of an ordered log such as a Kinesis shard, reference
  * lambda_function.py:140-141: records arrive in shard sequence order);
  * a late event would need watermark-delayed buffering, which the
  * engine's sliding/session windows (q24/q25) already demonstrate.
  *
  * NULL event types are DROPPED on input — exactly q128's three-legs-non-null
  * filter: a null leg never forms a trigram and does not reset the tail's
  * non-null neighbors in the batch query either (lead() skips nothing, but
  * the null-leg trigrams are filtered; dropping nulls before the tail keeps
  * the two formulations aligned on null-free sequences, and the generated
  * corpus has none).
  */
class FunnelTrigramProcessor
    extends StatefulProcessor[Long, FunnelEvent, FunnelTrigram] {
  @transient private var tail: ValueState[(String, String)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    tail = getHandle.getValueState[(String, String)](
      "tail", Encoders.product[(String, String)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
      timerValues: TimerValues): Iterator[FunnelTrigram] = {
    val ordered = rows.filter(_.eventType != null).toArray
      .sortBy(e => (e.us, e.eventId))
    var (e1, e2) = if (tail.exists()) tail.get() else (null: String, null: String)
    val out = Vector.newBuilder[FunnelTrigram]
    ordered.foreach { e =>
      if (e1 != null && e2 != null)
        out += FunnelTrigram(key, s"$e1>$e2>${e.eventType}")
      e1 = e2
      e2 = e.eventType
    }
    tail.update((e1, e2))
    out.result().iterator
  }
}

object StreamingFunnel {
  /** Event stream → per-user 3-step transition stream; count/top-k the
    * trigrams downstream (a streaming groupBy in update mode — the same
    * one-hash-agg shape as q128's batch tail). */
  def trigrams(events: Dataset[FunnelEvent]): Dataset[FunnelTrigram] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new FunnelTrigramProcessor, TimeMode.None(), OutputMode.Append())
  }
}
