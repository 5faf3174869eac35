package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Continuous OLS trend per key — the streaming twin of q183's batch
  * regression and the eleventh twin-family member: the monitoring shape
  * ("is this metric drifting, how fast, does a line explain it?") kept
  * CURRENT as data arrives, instead of re-regressing history per batch.
  * The six normal-equation power sums (n, Σx, Σy, Σx², Σxy, Σy²) form a
  * commutative monoid, so per-key state is six numbers regardless of
  * stream length, a restart resumes losslessly from the checkpoint, and
  * the emitted slope/intercept/R² after any stream prefix equal q183's
  * formulas over that prefix exactly (spec-pinned against the batch
  * operator on the same derivation).
  *
  * Arithmetic: sums and determinants in BigInt (the processor is
  * imperative Scala, not a two-engine SQL surface — wide integers cost
  * nothing and remove every overflow cliff q183 had to budget DECIMAL(38)
  * for); BigInt `/` truncates toward zero like Spark's `div` and
  * DuckDB's `//`, so slope and intercept are bit-identical to the batch
  * twin's. R² is the same fixed-order double quotient. Single-day keys
  * (den = 0) emit None, mirroring q183's NULL degrade.
  */
class OlsProcessor
    extends StatefulProcessor[String, (String, Long, Long), StreamingOls.Fit] {
  @transient private var sums: ValueState[Array[BigInt]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sums = getHandle.getValueState[Array[BigInt]](
      "ols", Encoders.kryo[Array[BigInt]], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[StreamingOls.Fit] = {
    var Array(n, sx, sy, sxx, sxy, syy) =
      if (sums.exists()) sums.get()
      else Array.fill(6)(BigInt(0))
    rows.foreach { case (_, x, y) =>
      n += 1; sx += x; sy += y
      sxx += BigInt(x) * x; sxy += BigInt(x) * y; syy += BigInt(y) * y
    }
    sums.update(Array(n, sx, sy, sxx, sxy, syy))
    Iterator.single(StreamingOls.fit(key, Array(n, sx, sy, sxx, sxy, syy)))
  }
}

object StreamingOls {
  final case class Fit(key: String, n: Long, slopeUcentsDay: Option[Long],
      iceptCents: Option[Long], r2: Option[Double])

  /** q183's formulas on a power-sum state vector. */
  def fit(key: String, s: Array[BigInt]): Fit = {
    val Array(n, sx, sy, sxx, sxy, syy) = s
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    if (den == 0) Fit(key, n.toLong, None, None, None)
    else Fit(key, n.toLong,
      Some(((BigInt(1000000) * num) / den).toLong),
      Some(((sy - (num * sx / den)) / n).toLong),
      if (deny == 0) None
      else Some((num.toDouble * num.toDouble) / (den.toDouble * deny.toDouble)))
  }

  /** (key, x, y) stream → per-batch cumulative fit per key; x in whole
    * days since the caller's anchor, y in exact cents (q183's units). */
  def trends(events: Dataset[(String, Long, Long)]): Dataset[Fit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new OlsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
