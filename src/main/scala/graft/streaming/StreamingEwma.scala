package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One emitted level-monitor row — field-for-field the batch q217 output
  * (event_type, t, x_cents, ewma_cents, ratio_ppm, is_anomaly). */
final case class EwmaPoint(event_type: String, t: Long, x_cents: Long,
    ewma_cents: Long, ratio_ppm: Option[Long], is_anomaly: Boolean)

/** Per-key EWMA state: the last processed day index, the exact decayed
  * cumulative sum cum = Σ x_i·2^i, and the current day's running total
  * (so a same-day top-up can recompute yesterday's level for fc). */
final case class EwmaState(lastT: Long, cum: Long, xCur: Long)

/** Continuous EWMA anomaly monitoring — the streaming twin of q217 and
  * the SIXTEENTH twin-family member: per event type, the exponentially-
  * weighted daily-spend level kept current as days close, each day
  * scored against the PRIOR day's level exactly as the batch operator
  * scores it. This is the drift family's one natural online operator
  * (q171/q172/q198 compare fixed windows — inherently batch; the EWMA
  * recurrence is already incremental).
  *
  * Twin contract — DIGIT parity (the moment-tuple discipline, not the
  * sketch band): after replaying any prefix, the last emitted row per
  * (event_type, t) is bit-identical to batch q217's row on the same
  * prefix, including gap-day 0-fills (a day with no events still moves
  * the level: the twin emits the skipped days' rows when the next
  * event day arrives). One deliberate divergence, documented: the batch
  * spine pads EVERY type to the GLOBAL max day; a causal per-key
  * operator cannot know the global horizon, so the twin emits each key
  * up to ITS OWN latest day — StreamingEwmaSpec compares against the
  * batch rows restricted to that range.
  *
  * State is a constant 24 bytes per key: (lastT, cum, xCur). The
  * round-13 verdict sketched a halve-per-day accumulator for an
  * unbounded horizon; that representation truncates a fraction bit per
  * day and CANNOT give digit parity with the batch closed form, so the
  * twin keeps the exact day-anchored cum — bounded not by halving but
  * by the SAME in-band guards as batch (span ≤ 63 days, per-term shift
  * bound, cum ≥ 0 wrap detector; `DriftQueries.scala` q217): past any
  * of them both engines fail loudly with the same DECIMAL(38) /
  * longer-half-life promotion. Within the operator's documented domain
  * the state value fits one Long exactly, so "bounded state" costs
  * nothing and buys exactness.
  *
  * Arrival contract (mirrors StreamingTransition's per-user one): rows
  * for a key arrive day-monotone — a row older than the key's current
  * open day fails loudly (revising emitted history is the batch q218
  * SCD2 path, not a monitor's). Same-day top-ups are fine and re-emit
  * the corrected row (downstream keeps the latest row per (key, t)).
  */
class EwmaProcessor
    extends StatefulProcessor[String, (String, Long, Long), EwmaPoint] {
  @transient private var st: ValueState[EwmaState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[EwmaState]("ewma",
      Encoders.product[EwmaState], TTLConfig.NONE)

  private def ewmaOf(cum: Long, t: Long): Long =
    cum / ((1L << (t + 1)) - 1L) // same mod-64 shift semantics as Spark's shiftleft

  private def point(key: String, t: Long, x: Long, cum: Long,
      cumPrev: Long): EwmaPoint = {
    val fc = if (t == 0L) None else Some(ewmaOf(cumPrev, t - 1))
    val ratio = fc.filter(_ != 0L).map(f => x * 1000000L / f)
    EwmaPoint(key, t, x, ewmaOf(cum, t),
      ratio, ratio.exists(r => r < 250000L || r > 4000000L))
  }

  private def guard(key: String, t: Long, x: Long): Unit = {
    require(t >= 0L && t <= 62L,
      s"q217 twin [$key]: day index $t outside [0, 62] - the 63-day span " +
        "cap (batch spine bound); promote to DECIMAL(38) or a longer half-life")
    require(x >= 0L,
      s"q217 twin [$key]: negative daily total $x at t=$t (div parity " +
        "needs x >= 0, the batch guard)")
    require(x <= (4611686018427387903L >> t) && x <= 9223372036854L,
      s"q217 twin [$key]: daily total $x too large for the 2^$t decay " +
        "weight or the ppm ratio at Long width - promote to DECIMAL(38)")
  }

  override def handleInputRows(key: String, rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[EwmaPoint] = {
    val s0 = if (st.exists()) st.get() else EwmaState(-1L, 0L, 0L)
    var (lastT, cum, xCur) = (s0.lastT, s0.cum, s0.xCur)
    val out = Seq.newBuilder[EwmaPoint]
    // daily totals within the trigger, walked in day order
    val byDay = rows.map(r => (r._2, r._3))
      .foldLeft(Map.empty[Long, Long]) { case (m, (t, x)) =>
        m.updated(t, m.getOrElse(t, 0L) + x)
      }.toSeq.sortBy(_._1)
    byDay.foreach { case (t, dx) =>
      require(t >= lastT,
        s"q217 twin [$key]: day $t arrived after day $lastT closed - " +
          "arrivals must be day-monotone per key (late revision is the " +
          "batch q218 SCD2 path)")
      if (t == lastT) { // same-day top-up: correct the open day's row
        xCur += dx
        guard(key, t, xCur)
        cum += (dx << t)
        require(cum >= 0L, s"q217 twin [$key]: cum wrapped Long at t=$t")
        out += point(key, t, xCur, cum, cum - (xCur << t))
      } else {
        var d = lastT + 1
        while (d <= t) { // gap days carry x=0; the level still decays
          val xd = if (d == t) dx else 0L
          guard(key, d, xd)
          val cumPrev = cum
          cum += (xd << d)
          require(cum >= 0L, s"q217 twin [$key]: cum wrapped Long at t=$d")
          out += point(key, d, xd, cum, cumPrev)
          d += 1
        }
        lastT = t
        xCur = dx
      }
    }
    st.update(EwmaState(lastT, cum, xCur))
    out.result().iterator
  }
}

object StreamingEwma {

  /** (event_type, day index t, cents) stream → the q217 row stream:
    * one row per (key, day) as days close, gap days 0-filled, same-day
    * top-ups re-emitted (latest row per (key, t) is current). The day
    * index is anchored by the caller (datediff from the deployment's
    * epoch day d0), exactly as batch anchors at the corpus min day. */
  def monitor(values: Dataset[(String, Long, Long)]): Dataset[EwmaPoint] = {
    import values.sparkSession.implicits._
    values.groupByKey(_._1)
      .transformWithState(new EwmaProcessor, TimeMode.None(), OutputMode.Append())
  }
}
