package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Continuous transition-pair extraction — the streaming twin of q185's
  * batch transition matrix and the twelfth twin-family member: the
  * journey-flow monitor ("from each event type, where do users go next?")
  * kept CURRENT as events arrive, instead of re-windowing history per
  * batch. Each user's state is ONE row — the chain tail (ts, event_id,
  * event_type of the latest event) — so state is O(#users) regardless of
  * stream length or rate: the corpus-sized per-user history that q185's
  * window pass re-sorts every run is exactly what this processor never
  * stores. Emitted (from, to) pairs over any stream prefix equal the
  * lead-1 pairs of q185's (ts, event_id)-ordered window over that prefix
  * (spec-pinned against the batch operator), so the cumulative matrix —
  * counts and exact integer-ppm rows — composes downstream from pairs
  * alone.
  *
  * Ordering contract: within a batch, a user's rows are sorted by
  * (ts, event_id) before chaining (micro-batches carry no intra-key
  * order); ACROSS batches the input must be per-user monotone — the same
  * arrive-in-order assumption every twin here documents, discharged in
  * production by a watermark-sorted upstream stage. */
class TransitionProcessor
    extends StatefulProcessor[Long, (Long, Long, Long, String), (String, String)] {
  @transient private var tail: ValueState[(Long, Long, String)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    tail = getHandle.getValueState[(Long, Long, String)](
      "tail", Encoders.kryo[(Long, Long, String)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long, String)],
      timerValues: TimerValues): Iterator[(String, String)] = {
    val sorted = rows.toArray.sortBy(r => (r._2, r._3))
    if (sorted.isEmpty) return Iterator.empty
    val out = Array.newBuilder[(String, String)]
    var prev: Option[(Long, Long, String)] =
      if (tail.exists()) Some(tail.get()) else None
    sorted.foreach { r =>
      prev.foreach(p => out += ((p._3, r._4)))
      prev = Some((r._2, r._3, r._4))
    }
    tail.update(prev.get)
    out.result().iterator
  }
}

object StreamingTransition {

  /** (user_id, tsMicros, event_id, event_type) stream → (from_type,
    * to_type) transition pairs, one per consecutive per-user event pair. */
  def pairs(events: Dataset[(Long, Long, Long, String)]): Dataset[(String, String)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new TransitionProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** q185's matrix formula over an emitted-pair multiset: (from, to, n,
    * p_ppm) rows with the same floor-division ppm arithmetic. */
  def matrix(pairs: Seq[(String, String)]): Seq[(String, String, Long, Long)] = {
    val n = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowTot = n.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    n.toSeq.map { case ((f, t), c) =>
      (f, t, c, c * 1000000L / rowTot(f))
    }.sortBy(r => (r._1, r._2))
  }
}
