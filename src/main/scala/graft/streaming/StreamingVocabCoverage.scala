package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Continuous Good–Turing / Chao1 vocabulary coverage — the streaming
  * twin of q203 and the fourteenth twin-family member: the "how much of
  * this source is still UNSEEN" estimate kept current as tokens arrive,
  * the signal that tells an ingest scheduler when a source has been
  * drained (P₀ → 0) versus when more of it keeps paying (P₀ high, Chao1
  * far above V).
  *
  * State per source is the word→count map as a `MapState` with POINT
  * updates — per-trigger state-store work is O(distinct words in the
  * batch), never O(vocabulary): a trigger carrying 10³ distinct words
  * against a 10⁷-word accumulated vocabulary touches 10³ map entries
  * (round 12 shipped this as a Kryo'd `ValueState[Map]`, which
  * serialized the WHOLE vocabulary per source per trigger — state SIZE
  * was right, per-trigger cost was the scale-killer; the spec now pins
  * updated-rows-per-trigger ≈ batch novelty, not vocab size). The
  * emitted row reads NO map scan either: the (v, t, n1, n2) moments ride
  * a small per-source `ValueState` updated incrementally on each word's
  * count transition — entering count 1 is +1 to v and n1, leaving 1 is
  * −1 to n1, entering/leaving 2 adjusts n2 — so emission is O(1). Rows
  * within the batch pre-aggregate into a local per-word delta map first
  * (bounded by the batch, not the stream), giving exactly one
  * getValue/updateValue round-trip per distinct word per trigger.
  *
  * Emitted per source per trigger: the running
  * (v_obs, t_tokens, n1, n2, p0_ppm, chao1) row with EXACTLY q203's
  * integer arithmetic (ppm and Chao1 divisions on exact Long counts), so
  * after any stream prefix the row equals the batch operator over that
  * prefix — spec-pinned value-for-value, order-free because counts are
  * commutative (this twin needs NO arrive-in-order assumption, unlike
  * the gap/chain twins). */
class VocabCoverageProcessor
    extends StatefulProcessor[String, (String, String),
      (String, Long, Long, Long, Long, Long, Long)] {
  @transient private var counts: MapState[String, Long] = _
  // (v_obs, t_tokens, n1, n2) — O(1) to read, so emission never scans the map.
  @transient private var moments: ValueState[(Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counts = getHandle.getMapState[String, Long](
      "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    moments = getHandle.getValueState[(Long, Long, Long, Long)](
      "moments",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[(String, String)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long, Long)] = {
    var (v, t, n1, n2) =
      if (moments.exists()) moments.get() else (0L, 0L, 0L, 0L)
    // Pre-aggregate the batch locally (memory bounded by THIS batch's
    // distinct words) so each distinct word costs one state point-read
    // and one point-write regardless of its in-batch multiplicity.
    val delta = mutable.HashMap.empty[String, Long]
    rows.foreach { r => delta.update(r._2, delta.getOrElse(r._2, 0L) + 1L) }
    delta.foreach { case (w, d) =>
      val prev = if (counts.containsKey(w)) counts.getValue(w) else 0L
      val next = prev + d
      counts.updateValue(w, next)
      t += d
      if (prev == 0L) v += 1L
      if (prev == 1L) n1 -= 1L else if (prev == 2L) n2 -= 1L
      if (next == 1L) n1 += 1L else if (next == 2L) n2 += 1L
    }
    moments.update((v, t, n1, n2))
    if (t == 0L) Iterator.empty
    else Iterator.single((key, v, t, n1, n2,
      (n1 * 1000000L) / t, v + (n1 * (n1 - 1L)) / (2L * (n2 + 1L))))
  }
}

object StreamingVocabCoverage {

  /** (source, word) token stream → running per-source
    * (source, v_obs, t_tokens, n1, n2, p0_ppm, chao1) — q203's row,
    * one per source per trigger. */
  def stats(tokens: Dataset[(String, String)])
      : Dataset[(String, Long, Long, Long, Long, Long, Long)] = {
    import tokens.sparkSession.implicits._
    tokens.groupByKey(_._1)
      .transformWithState(new VocabCoverageProcessor, TimeMode.None(), OutputMode.Append())
  }
}
