package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Continuous Good–Turing / Chao1 vocabulary coverage — the streaming
  * twin of q203 and the fourteenth twin-family member: the "how much of
  * this source is still UNSEEN" estimate kept current as tokens arrive,
  * the signal that tells an ingest scheduler when a source has been
  * drained (P₀ → 0) versus when more of it keeps paying (P₀ high, Chao1
  * far above V). State per source is the word→count map — VOCABULARY-
  * bounded, not stream-bounded: a trillion-token source with a 10⁷-word
  * vocabulary holds 10⁷ state entries, and the full token history q203's
  * batch scan re-reads is exactly what this processor never stores.
  * (Kryo'd ValueState map here, rewritten per trigger — the MapState
  * point-update API is the production upgrade once a per-word-delta
  * emission is needed; the twin contract is about SIZE, which is
  * identical.)
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
  @transient private var st: ValueState[Map[String, Long]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Map[String, Long]](
      "vocab", Encoders.kryo[Map[String, Long]], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, String)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long, Long)] = {
    var m = if (st.exists()) st.get() else Map.empty[String, Long]
    rows.foreach { r => m = m.updated(r._2, m.getOrElse(r._2, 0L) + 1L) }
    st.update(m)
    val v = m.size.toLong
    val t = m.valuesIterator.sum
    val n1 = m.valuesIterator.count(_ == 1L).toLong
    val n2 = m.valuesIterator.count(_ == 2L).toLong
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
