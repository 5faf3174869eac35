package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Continuous KMV distinct sketch per group — the streaming twin of
  * q182's batch `kmv_sketch` aggregate and the tenth member of the twin
  * family: a 100 TB ingest watching "how many distinct users has each
  * event type seen, and how much do two types overlap" without ever
  * holding a distinct set. Per group the state is the bottom-k distinct
  * hash set — EXACTLY the batch aggregate's buffer, applied sequentially
  * across micro-batches — so the emitted sketch after any prefix of the
  * stream is bit-identical to running the batch aggregate over that
  * prefix (the spec pins this), estimates compose the same way
  * (union/intersection on two emitted sketches), and a restart resumes
  * from the checkpoint losslessly.
  *
  * State shape: a fixed ≤ k-element sorted array per key. Unlike the
  * tolerance-window twins (NearestAlign/Twa), the state here cannot grow
  * with rate or lateness — a `ValueState` rewrite of 64 longs per batch
  * is the idiomatic shape, not a `ListState` (there is nothing to
  * append; the merge is a bounded set union).
  *
  * Emits one (group, sketch, theta, est_distinct) row per key per batch
  * in Update mode; est_distinct is q182's (k−1)·2⁶⁰/θ estimator (BigInt
  * here — the processor is imperative Scala, not a two-engine SQL
  * surface, so wide arithmetic costs nothing).
  */
class KmvProcessor(k: Int)
    extends StatefulProcessor[String, (String, Long), StreamingKmv.Out] {
  @transient private var sk: ValueState[Array[Long]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sk = getHandle.getValueState[Array[Long]](
      "kmv", Encoders.kryo[Array[Long]], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[StreamingKmv.Out] = {
    val buf = scala.collection.mutable.TreeSet.empty[Long]
    if (sk.exists()) buf ++= sk.get()
    rows.foreach { case (_, h) =>
      if (buf.size < k) buf += h
      else if (h < buf.last && !buf.contains(h)) { buf -= buf.last; buf += h }
    }
    val arr = buf.toArray
    sk.update(arr)
    Iterator.single(StreamingKmv.Out(key, arr, StreamingKmv.estimate(arr, k)))
  }
}

object StreamingKmv {
  final case class Out(group: String, sketch: Array[Long], estDistinct: Long)

  /** q182's estimator on a bottom-k sketch: exact size below k, else
    * (k−1)·2⁶⁰ div θ (θ = the k-th smallest, i.e. the sketch max). */
  def estimate(sketch: Array[Long], k: Int): Long =
    if (sketch.length < k) sketch.length.toLong
    else ((BigInt(k - 1) << 60) / BigInt(sketch.last)).toLong

  /** Jaccard sample over two sketches, q182's intersection rule: of the
    * merged bottom-k, the fraction present in BOTH inputs. Returns
    * (intersection sample size, merged size) — estInter = sample/merged
    * × estimate(union). */
  def overlap(a: Array[Long], b: Array[Long], k: Int): (Int, Array[Long]) = {
    val merged = (a.toSet ++ b.toSet).toArray.sorted.take(k)
    (merged.count(h => a.contains(h) && b.contains(h)), merged)
  }

  /** (group, hash60) stream → per-batch cumulative sketch + distinct
    * estimate per group; sketches compose downstream via [[overlap]]. */
  def sketches(events: Dataset[(String, Long)], k: Int = 64): Dataset[Out] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new KmvProcessor(k), TimeMode.None(), OutputMode.Update())
  }
}
