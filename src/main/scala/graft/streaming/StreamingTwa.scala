package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Continuous time-weighted-average segmentation — the streaming twin of
  * q180's batch TWA: each event's value is HELD until the key's next event,
  * and the finalized (value, held-duration) segments stream out as soon as
  * the watermark proves them immutable. The ninth member of the twin family
  * (NearDup/Decontam/Funnel/Sessionize/Drift/TopK/NearestAlign), covering
  * the time-series-aggregation side: a billing/observability pipeline
  * consumes the segments incrementally (TWA over any horizon = two running
  * sums), instead of re-running the lead() window over history every batch.
  *
  * Design (`transformWithState`, event-time timers, RocksDB state):
  *
  *  - A segment is the pair of CONSECUTIVE events (eᵢ, eᵢ₊₁) in the batch
  *    operator's total order (ts, then event_id — the same tie-break, so
  *    replayed history decomposes identically). It can finalize only when
  *    no admissible future arrival can land between its endpoints: the
  *    engine drops rows with ts < watermark, so once `eᵢ₊₁.ts < watermark`
  *    the pair is immutable and emits exactly once.
  *  - State per key is the out-of-orderness window plus ONE event: drains
  *    drop everything before the last finalized endpoint (it survives as
  *    the open segment's start). Arrivals APPEND to a `ListState` (O(1)
  *    RocksDB merge per event); the buffer is rewritten only when it
  *    shrinks — the family's state-shape discipline.
  *  - Durations are `µs div 1000` milliseconds and values exact cents,
  *    mirroring q180's overflow-bounded arithmetic; zero-length segments
  *    (timestamp ties) emit with dt_ms = 0 and are excluded from any TWA
  *    by construction, exactly as the batch HAVING does.
  *
  * StreamingTwaSpec pins segment-for-segment parity with the batch lead()
  * decomposition across micro-batch boundaries, TWA equality after replay,
  * and the bounded-state invariant under a many-batch flood.
  */
class TwaProcessor
    extends StatefulProcessor[Long, StreamingTwa.In, StreamingTwa.Seg] {
  import StreamingTwa.{In, Seg}

  @transient private var buf: ListState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buf = getHandle.getListState[(Long, Long, Long)]("events",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  private def drain(key: Long, wmUs: Long): Iterator[Seg] = {
    val es = buf.get().toVector.sortBy(e => (e._1, e._2))
    if (es.isEmpty) return Iterator.empty
    // last index whose endpoint the watermark has sealed (strict <: an
    // arrival AT the watermark is still admissible and could split a pair
    // ending exactly there)
    val last = es.lastIndexWhere(_._1 < wmUs)
    if (last < 1) return Iterator.empty
    val keep = es.drop(last)
    if (keep.size != es.size) buf.put(keep.toArray)
    (0 until last).iterator.map { i =>
      val (t, _, cents) = es(i)
      val next = es(i + 1)._1
      Seg(key, t, next, cents, (next - t) / 1000L)
    }
  }

  override def handleInputRows(key: Long, rows: Iterator[In],
      timerValues: TimerValues): Iterator[Seg] = {
    val batch = rows.toVector
    if (batch.nonEmpty)
      buf.appendList(batch.map(e => (e.tUs, e.eventId, e.cents)).toArray)
    // a segment ENDING at this event finalizes when the watermark passes
    // its ts; +1ms because timers fire strictly after the registered time
    batch.foreach(e => getHandle.registerTimer(e.tUs / 1000L + 1L))
    drain(key, timerValues.getCurrentWatermarkInMs() * 1000L)
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[Seg] =
    drain(key, timerValues.getCurrentWatermarkInMs() * 1000L)
}

object StreamingTwa {
  /** One observation: the value (exact cents) current from `tUs` on. */
  final case class In(userId: Long, eventId: Long, tUs: Long, cents: Long)
  /** One finalized held-value segment; a TWA over any horizon is
    * `Σ cents·dtMs div Σ dtMs` over its segments. */
  final case class Seg(userId: Long, tUs: Long, nextUs: Long, cents: Long,
      dtMs: Long)

  /** (user, event, ts, cents) stream → finalized segments, emitted once
    * each pair of consecutive observations is sealed by the watermark.
    * `watermarkDelay` is the caller's lateness budget. */
  def segments(events: Dataset[In],
      watermarkDelay: String = "0 seconds"): Dataset[Seg] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    events
      .withColumn("__ts", timestamp_micros(col("tUs")))
      .withWatermark("__ts", watermarkDelay)
      .as[In]
      .groupByKey(_.userId)
      .transformWithState(new TwaProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
