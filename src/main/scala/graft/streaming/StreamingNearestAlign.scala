package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Continuous nearest-event temporal alignment — the streaming twin of
  * [[graft.operators.NearestEventJoin]] (q176): for every LEFT event on a
  * key, the RIGHT event with the smallest |Δt| within ±tolerance, ties to
  * the earlier right. This completes the twin family
  * (NearDup/Decontam/Funnel/Sessionize/Drift/TopK) on the JOIN side —
  * sensor-fusion alignment running against live arrivals instead of
  * re-windowing history every batch.
  *
  * Design (`transformWithState`, event-time timers, RocksDB state):
  *
  *  - A left event cannot finalize until no closer future right can
  *    arrive, i.e. until the WATERMARK passes `left.t + tolerance`. Each
  *    left registers an event-time timer there; `handleExpiredTimer`
  *    finalizes every pending left the watermark now covers, scoring it
  *    against the buffered rights (backward AND forward candidates —
  *    both directions of the batch operator's two windows).
  *  - State per key is BOUNDED BY THE TOLERANCE WINDOW, not the stream:
  *    pending lefts all have `t + tol >` watermark, and buffered rights
  *    prune below `watermark − 2·tol` (a pending left's earliest backward
  *    candidate). At any watermark, state ≈ arrival-rate × tolerance —
  *    the O(window) invariant every twin in the family keeps.
  *  - The watermark contract supplies the ordering guarantee the batch
  *    operator gets from its sort: in-tolerance late rights that beat the
  *    watermark still match (they arrive before the left's timer fires);
  *    rights later than the watermark delay are dropped by the engine —
  *    the standard lateness trade, chosen by the watermark the caller
  *    sets. Intra-batch arrival order is irrelevant (candidates are
  *    scored from the buffer, not a running value).
  *
  * StreamingNearestAlignSpec pins event-for-event parity with the batch
  * operator on replayed history, including matches that cross micro-batch
  * boundaries in both directions, tolerance cutoffs, and the
  * earlier-right tie rule.
  */
class NearestAlignProcessor(toleranceUs: Long)
    extends StatefulProcessor[String, StreamingNearestAlign.In, StreamingNearestAlign.Out] {
  import StreamingNearestAlign.{In, Out}

  // ListState, not ValueState[Vector]: arrivals APPEND (an O(1) RocksDB
  // merge per event) instead of rewriting the whole buffer every batch;
  // the only full rewrites are drain-time prune/partition, which run when
  // state actually shrinks. Under a high arrival rate this is the
  // difference between O(events) and O(events × window) bytes written
  // per key per batch — the same shape the other twins keep.
  @transient private var rights: ListState[(Long, Long)] = _
  @transient private var lefts: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    rights = getHandle.getListState[(Long, Long)](
      "rights", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)
    lefts = getHandle.getListState[Long](
      "lefts", Encoders.scalaLong, TTLConfig.NONE)
  }

  private def watermarkUs(tv: TimerValues): Long =
    tv.getCurrentWatermarkInMs() * 1000L

  /** Best right for a left at `t`: min |Δt| within tolerance, ties to the
    * EARLIER right — exactly the batch operator's pick rule. */
  private def score(t: Long, rs: Vector[(Long, Long)]): Out = {
    var best: Option[(Long, Long, Long)] = None // (dist, rt, payload)
    rs.foreach { case (rt, p) =>
      val d = math.abs(rt - t)
      if (d <= toleranceUs) {
        val better = best match {
          case None => true
          case Some((bd, brt, _)) => d < bd || (d == bd && rt < brt)
        }
        if (better) best = Some((d, rt, p))
      }
    }
    best match {
      case Some((d, rt, p)) => Out("", t, Some(rt), Some(p), Some(d))
      case None => Out("", t, None, None, None)
    }
  }

  /** Finalize every pending left the watermark covers; prune rights that
    * no surviving left can reach. Scoring reads the PRE-prune right set
    * (any pending left's reachable candidates survive the previous prune
    * by the 2·tol margin); state is rewritten only when it shrinks. */
  private def drain(key: String, wmUs: Long): Iterator[Out] = {
    val rs = rights.get().toVector
    val keep = rs.filter { case (rt, _) => rt >= wmUs - 2 * toleranceUs }
    if (keep.size != rs.size) {
      if (keep.isEmpty) rights.clear() else rights.put(keep.toArray)
    }
    val ls = lefts.get().toVector
    val (ready, pending) = ls.partition(t => t + toleranceUs < wmUs)
    if (ready.nonEmpty) {
      if (pending.isEmpty) lefts.clear() else lefts.put(pending.toArray)
    }
    ready.sorted.iterator.map(t => score(t, rs).copy(key = key))
  }

  override def handleInputRows(key: String, rows: Iterator[In],
      timerValues: TimerValues): Iterator[Out] = {
    val batch = rows.toVector
    val newRights = batch.filter(_.isRight).map(r => (r.tUs, r.payload))
    if (newRights.nonEmpty) rights.appendList(newRights.toArray)
    val newLefts = batch.filterNot(_.isRight).map(_.tUs)
    if (newLefts.nonEmpty) lefts.appendList(newLefts.toArray)
    // one event-time timer per new left at t + tol (the earliest moment
    // its match set is complete); +1ms because timers fire when the
    // watermark passes the registered time
    newLefts.foreach(l =>
      getHandle.registerTimer((l + toleranceUs) / 1000L + 1L))
    // eager path: the watermark may already cover older lefts
    drain(key, watermarkUs(timerValues))
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[Out] =
    drain(key, watermarkUs(timerValues))
}

object StreamingNearestAlign {
  /** One event: `isRight` = the match-candidate side. */
  final case class In(key: String, tUs: Long, isRight: Boolean, payload: Long)
  /** One finalized left with its nearest-right verdict (NULLs = nothing
    * within tolerance). */
  final case class Out(key: String, leftT: Long, matchT: Option[Long],
      matchPayload: Option[Long], dtUs: Option[Long])

  /** (key, tUs, isRight, payload) stream → finalized alignments, emitted
    * once each left's tolerance window closes under the watermark.
    * `watermarkDelay` is the caller's lateness budget: rights later than
    * it are dropped by the engine before they can match. */
  def align(events: Dataset[In], toleranceUs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[Out] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    events
      .withColumn("__ts", timestamp_micros(col("tUs")))
      .withWatermark("__ts", watermarkDelay)
      .as[In]
      .groupByKey(_.key)
      .transformWithState(new NearestAlignProcessor(toleranceUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
