package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.functions.KllOps

/** Continuous quantile monitoring — the streaming twin of q216 and the
  * FIFTEENTH twin-family member: per-key running quantile estimates kept
  * current as values arrive, the p99-latency/spend monitor a dashboard
  * polls without ever re-sorting history. State per key is ONE serialized
  * KLL compactor ladder — O(k·log(n/k)) bytes regardless of stream
  * length, updated by the IDENTICAL [[graft.functions.KllOps]] code the
  * batch aggregate runs (one compaction rule, one wire format; the twin
  * cannot drift from the batch operator without breaking both).
  *
  * Twin contract — BAND parity, not digit parity: a KLL sketch's content
  * depends on the merge tree (batch partials merge shuffle-side; the
  * stream folds batches sequentially), so unlike the moment-tuple twins
  * the estimates need not be bit-equal to batch. What IS invariant — and
  * what the spec pins after replaying any prefix — is the deterministic
  * rank-error envelope: every emitted estimate's TRUE rank lies within
  * the same n·L/(2k)-derived band the batch witness (q216) asserts, and
  * the exact count n matches batch exactly (weight conservation holds
  * under any fold order). */
class KllProcessor(k: Int, ppms: Seq[Long])
    extends StatefulProcessor[String, (String, Long), (String, Long, Seq[Long])] {
  @transient private var st: ValueState[Array[Byte]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Array[Byte]]("kll", Encoders.BINARY, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Seq[Long])] = {
    val buf = if (st.exists()) KllOps.deserialize(st.get()) else KllOps.empty()
    rows.foreach(r => KllOps.offer(buf, k, r._2))
    st.update(KllOps.serialize(buf))
    if (buf.n == 0L) Iterator.empty
    else Iterator.single((key, buf.n, KllOps.quantiles(buf, ppms).toSeq))
  }
}

object StreamingKll {

  /** (key, value) stream → running per-key (key, n, quantile estimates
    * aligned with `ppms`), one row per key per trigger. */
  def stats(values: Dataset[(String, Long)], k: Int, ppms: Seq[Long])
      : Dataset[(String, Long, Seq[Long])] = {
    import values.sparkSession.implicits._
    values.groupByKey(_._1)
      .transformWithState(new KllProcessor(k, ppms), TimeMode.None(), OutputMode.Append())
  }
}
