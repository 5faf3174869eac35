package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input shape for the stateful counter: one audit/stream event. */
case class CountEvent(user_id: Long, ts: Timestamp)

/** Running per-user state emitted on every update. */
case class UserCount(user_id: Long, n_events: Long, last_seen: Timestamp)

/** Custom-state streaming operator (SURVEY.md §2b "stateful", the
  * `flatMapGroupsWithState` arm): a per-key running counter that survives
  * across micro-batches — the general form behind "events seen per account",
  * rate limiting, or session accumulators.
  *
  * State is one tiny record per key, partitioned by the grouping key across
  * executors, checkpointed by the engine; at 100 TB of traffic the state
  * size tracks distinct keys, not events. For bounded state on unbounded
  * keys, swap NoTimeout for an event-time timeout and clear expired groups.
  */
object StatefulCounts {

  def perUserCounts(events: Dataset[CountEvent])(
      implicit spark: SparkSession): Dataset[UserCount] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserCount, UserCount](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[CountEvent], state: GroupState[UserCount]) =>
          val evs = batch.toSeq
          if (evs.isEmpty) Iterator.empty
          else {
            val prev = state.getOption.getOrElse(UserCount(uid, 0L, new Timestamp(0L)))
            val last = evs.map(_.ts).maxBy(_.getTime)
            val next = UserCount(uid, prev.n_events + evs.size,
              if (last.after(prev.last_seen)) last else prev.last_seen)
            state.update(next)
            Iterator.single(next)
          }
      }
  }
}
