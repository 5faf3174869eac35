package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Cross-batch running event counter per key on the `transformWithState`
  * API (Spark 4's arbitrary-state surface, successor to
  * mapGroupsWithState): state lives in the RocksDB state store, so per-key
  * state size is bounded by disk not heap, state survives restarts via the
  * checkpoint, and TTL can expire idle keys — the properties the older
  * in-memory state API lacks at 100 TB stream scale.
  *
  * Complements streaming/StatefulCounts (flatMapGroupsWithState): same
  * semantics, next-generation state backend.
  */
class RunningCountProcessor extends StatefulProcessor[Long, (Long, Long), (Long, Long)] {
  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val n = (if (count.exists()) count.get() else 0L) + rows.size
    count.update(n)
    Iterator.single((key, n))
  }
}

object RunningCounts {
  /** (user_id, anything) stream → (user_id, running count) updates. */
  def runningCounts(events: Dataset[(Long, Long)]): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RunningCountProcessor, TimeMode.None(), OutputMode.Update())
  }
}
