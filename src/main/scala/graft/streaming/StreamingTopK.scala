package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Continuous heavy hitters per group — the streaming twin of q105's
  * two-pass exact scheme and the monitoring shape a 100 TB ingest runs to
  * watch "what is suddenly frequent" without ever holding a full frequency
  * table: per group, the state is one Misra–Gries summary of ≤ k counters
  * (the same algorithm as [[graft.functions.MisraGriesAgg]], here applied
  * SEQUENTIALLY across micro-batches), so state size is O(k) per group
  * regardless of stream length or item cardinality, lives in RocksDB, and
  * survives restarts via the checkpoint.
  *
  * The Misra–Gries guarantee carries across batches because the summary
  * is exactly the sequential algorithm's state: after N total rows, any
  * item with true frequency > N/(k+1) is guaranteed present, and each
  * reported weight w(x) satisfies f(x) − N/(k+1) ≤ w(x) ≤ f(x) — the
  * summary weights are LOWER bounds on true counts. (Production then
  * verifies candidates exactly, q105's second pass; the monitor's job is
  * to never miss a heavy item.) StreamingTopKSpec pins the guarantee, the
  * lower-bound property, and cross-batch accumulation on an adversarial
  * replay.
  */
class MisraGriesProcessor(k: Int)
    extends StatefulProcessor[String, (String, String), (String, String, Long)] {
  @transient private var summary: ValueState[Map[String, Long]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    summary = getHandle.getValueState[Map[String, Long]](
      "mg", Encoders.kryo[Map[String, Long]], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, String)],
      timerValues: TimerValues): Iterator[(String, String, Long)] = {
    val buf = scala.collection.mutable.HashMap.empty[String, Long]
    if (summary.exists()) buf ++= summary.get()
    rows.foreach { case (_, item) =>
      buf.get(item) match {
        case Some(c) => buf(item) = c + 1
        case None if buf.size < k => buf(item) = 1L
        case None => // decrement-all step: every counter pays one
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { it =>
            val c = buf(it) - 1
            if (c == 0L) dead += it else buf(it) = c
          }
          dead.foreach(buf.remove)
      }
    }
    summary.update(buf.toMap)
    buf.iterator.map { case (item, w) => (key, item, w) }
  }
}

object StreamingTopK {
  /** (group, item) stream → per-batch (group, item, weight) summary
    * updates; weights are Misra–Gries lower bounds on true counts. */
  def heavyHitters(events: Dataset[(String, String)], k: Int = 8): Dataset[(String, String, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new MisraGriesProcessor(k), TimeMode.None(), OutputMode.Update())
  }
}
