package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, TimerValues, ValueState}

/** One emitted dimension-version row — the batch q218 internal version
  * stream's fields, keyed by (user_id, valid_from_us): the latest row
  * per key is current (an open version's row is re-emitted as its
  * duration extends, exactly like StreamingEwma's same-day top-ups). */
final case class Scd2Version(user_id: Long, event_type: String,
    valid_from_us: Long, dur_us: Long, cur: Boolean, n_events: Long)

/** Per-user open-version state: the version's type, its start, the last
  * observed (us, event_id) arrival cursor, and the version's event
  * count — one constant-size row per user. */
final case class Scd2State(openType: String, startUs: Long,
    lastUs: Long, lastEid: Long, nEvents: Long)

/** Online SCD2 dimension-history maintenance — the streaming twin of
  * q218 and the SEVENTEENTH twin-family member: each user's event-type
  * stream collapses consecutive duplicates into versions AS EVENTS
  * ARRIVE, the warehouse pattern where the type-2 dimension is kept
  * current continuously instead of rebuilt from the event log
  * (`reference lambda_function.py:46-47` derives per-record timestamps
  * for exactly this kind of downstream chronology).
  *
  * Twin contract — DIGIT parity with batch q218 on ANY prefix, with NO
  * causal clipping (unlike StreamingEwma's per-key horizon): after
  * replaying a prefix per-user in (ts, event_id) order, the latest
  * emitted row per (user_id, valid_from_us) IS the batch version
  * stream of that prefix — a closed version's row is final the moment
  * the type changes (its duration is the next version's start minus
  * its own, known right then), and the OPEN version's row after the
  * user's last event carries dur = last_us − start_us, which is
  * exactly the batch definition (batch closes the open version at the
  * user's max event timestamp — causally, the last event seen so far).
  * Hence the published q218 census (n_versions / n_current /
  * total_dur_us / mean_dur_us per type) recomputed over the twin's
  * latest rows matches the batch census to the digit —
  * StreamingScd2Spec pins both levels.
  *
  * State is one constant-size row per user (type, start, arrival
  * cursor, event count). No TTL: a dimension's open version never
  * expires while the pipeline lives — state growth is bounded by the
  * user dimension's own cardinality, the same bound the batch window
  * partition carries.
  *
  * Arrival contract (mirrors StreamingTransition's): rows for a user
  * arrive (ts, event_id)-monotone — an arrival strictly behind the
  * user's cursor fails loudly (revising emitted history is the batch
  * rebuild path, not the monitor's). Duplicate (ts, event_id) pairs
  * also fail: the batch window order would make their version split
  * ambiguous. A TYPE CHANGE at the open version's start microsecond is
  * likewise excluded (loud require): it would close a zero-duration
  * version sharing the new open version's (user_id, valid_from_us)
  * key, and the downstream latest-row-per-key convention would drop it
  * while batch q218 counts it — that input is the batch rebuild path
  * (round-15 advisor finding). */
class Scd2Processor
    extends StatefulProcessor[Long, (Long, Long, Long, String), Scd2Version] {
  @transient private var st: ValueState[Scd2State] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Scd2State]("scd2",
      Encoders.product[Scd2State], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Long, String)],
      timerValues: TimerValues): Iterator[Scd2Version] = {
    var s = if (st.exists()) Option(st.get()) else None
    val out = Seq.newBuilder[Scd2Version]
    // within-trigger arrivals walked in the batch window's (us, eid) order
    rows.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, eid, us, tpe) =>
      s match {
        case None =>
          s = Some(Scd2State(tpe, us, us, eid, 1L))
        case Some(cur) =>
          require(us > cur.lastUs || (us == cur.lastUs && eid > cur.lastEid),
            s"q218 twin [user $key]: arrival (us=$us, event=$eid) is not " +
              s"(ts, event_id)-monotone past cursor (${cur.lastUs}, " +
              s"${cur.lastEid}) - late revision is the batch rebuild path")
          if (tpe == cur.openType)
            s = Some(cur.copy(lastUs = us, lastEid = eid,
              nEvents = cur.nEvents + 1L))
          else {
            // A type change at the open version's own start microsecond
            // would close a ZERO-duration version whose (user, valid_from)
            // key equals the new open version's — downstream "latest row
            // per key" would silently drop the closed version while batch
            // q218 counts it (round-15 advisor finding). The twin contract
            // excludes that input loudly; replaying it is the batch
            // rebuild path. (us > startUs suffices: the cursor require
            // above already gives us ≥ lastUs ≥ startUs, so the collision
            // is exactly the all-same-microsecond open version.)
            require(us > cur.startUs,
              s"q218 twin [user $key]: type change at the open version's " +
                s"start microsecond (us=$us) would collide on the " +
                "(user_id, valid_from_us) downstream key and drop the " +
                "zero-duration closed version - equal-timestamp type flips " +
                "are the batch rebuild path")
            // close the open version: its end IS this event's start
            out += Scd2Version(key, cur.openType, cur.startUs,
              us - cur.startUs, cur = false, cur.nEvents)
            s = Some(Scd2State(tpe, us, us, eid, 1L))
          }
      }
      // the open version's current row (re-emitted as it extends; the
      // latest row per (user, valid_from) is current downstream)
      val o = s.get
      out += Scd2Version(key, o.openType, o.startUs,
        o.lastUs - o.startUs, cur = true, o.nEvents)
    }
    s.foreach(st.update)
    out.result().iterator
  }
}

object StreamingScd2 {

  /** (user_id, event_id, unix_micros(ts), event_type) stream → the q218
    * version-row stream: closed versions final on emission, the open
    * version re-emitted as it extends. Downstream keeps the latest row
    * per (user_id, valid_from_us); the q218 census is one group-by over
    * those rows. */
  def history(events: Dataset[(Long, Long, Long, String)])
      : Dataset[Scd2Version] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new Scd2Processor, TimeMode.None(), OutputMode.Append())
  }
}
