package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Continuous inter-arrival burstiness — the streaming twin of q214 and
  * the thirteenth twin-family member: the "is this stream still Poisson?"
  * monitor kept CURRENT per event type as events arrive. Each type's
  * state is ONE moment tuple — (last ts, last event_id, n, min, max,
  * Σgap, Σgap²) — so state is O(#types) regardless of stream length or
  * rate; the full gap history that q214's window pass re-derives per run
  * is exactly what this processor never stores. After any stream prefix
  * the emitted running row equals q214's batch output over that prefix
  * (spec-pinned value-for-value, including the CV² ppm floor division).
  *
  * Arithmetic: gaps are exact integer MICROSECONDS (the q212/q214
  * lesson); Σgap² rides a BigInt in state because a month of
  * microsecond gaps squares past Long (the batch twin uses DECIMAL(38)
  * for the same reason), and CV²_ppm = 10⁶·(n·Σg² − (Σg)²) div (Σg)²
  * divides non-negative BigInts — BigInt `/` truncates like the batch
  * DECIMAL `div`, so the twin is digit-identical, not approximately so.
  *
  * Ordering contract: within a batch a type's rows sort by (ts,
  * event_id); across batches the input must be per-type monotone — the
  * same arrive-in-order assumption every twin documents, discharged in
  * production by a watermark-sorted upstream stage. */
class BurstinessProcessor
    extends StatefulProcessor[String, (String, Long, Long),
      (String, Long, Long, Long, Long, Long)] {
  // (lastTs, lastId, nGaps, minG, maxG, sumG, sumG2)
  @transient private var st: ValueState[(Long, Long, Long, Long, Long, Long, BigInt)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long, Long, Long, Long, BigInt)](
      "burst", Encoders.kryo[(Long, Long, Long, Long, Long, Long, BigInt)],
      TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long)] = {
    val sorted = rows.toArray.sortBy(r => (r._2, r._3))
    if (sorted.isEmpty) return Iterator.empty
    var (lastTs, lastId, n, minG, maxG, sg, sg2) =
      if (st.exists()) st.get()
      else (Long.MinValue, Long.MinValue, 0L, Long.MaxValue, Long.MinValue,
        0L, BigInt(0))
    sorted.foreach { r =>
      if (lastTs != Long.MinValue) {
        val g = r._2 - lastTs
        n += 1
        if (g < minG) minG = g
        if (g > maxG) maxG = g
        sg += g
        sg2 += BigInt(g) * BigInt(g)
      }
      lastTs = r._2; lastId = r._3
    }
    st.update((lastTs, lastId, n, minG, maxG, sg, sg2))
    if (n >= 2 && sg > 0) {
      val sgB = BigInt(sg)
      val cv2 = (BigInt(1000000) * (BigInt(n) * sg2 - sgB * sgB)) / (sgB * sgB)
      Iterator.single((key, n, minG, maxG, sg / n, cv2.toLong))
    } else Iterator.empty
  }
}

object StreamingBurstiness {

  /** (event_type, tsMicros, event_id) stream → running
    * (event_type, n_gaps, min_gap_us, max_gap_us, mean_gap_us, cv2_ppm)
    * — one row per type per trigger once ≥ 2 gaps exist. */
  def stats(events: Dataset[(String, Long, Long)])
      : Dataset[(String, Long, Long, Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new BurstinessProcessor, TimeMode.None(), OutputMode.Append())
  }
}
