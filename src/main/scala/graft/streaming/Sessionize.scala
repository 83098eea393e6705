package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the stateful §2.11 counterpart of
  * the batch `event_sessionize` query: per-user sessions close when no
  * event arrives within the gap, enforced by EVENT-TIME timeouts against
  * the stream's watermark (not wall clock, so replays are deterministic).
  *
  * State per user is ONE open session (start/end/count) — O(users) total,
  * bounded regardless of stream length; closed sessions are emitted
  * immediately, and the final open session is flushed when the watermark
  * passes its gap horizon. This is the scale posture the batch window
  * form cannot offer on an unbounded stream.
  */
object Sessionize {

  // `ts` carries the watermark: the event-time column must stay in the
  // Dataset feeding the stateful operator or Spark rejects the timeout
  case class Ev(user_id: Long, event_id: Long, us: Long,
      ts: java.sql.Timestamp)
  case class Open(start: Long, end: Long, n: Long)
  case class Session(user_id: Long, n_events: Long, start_us: Long,
      end_us: Long, duration_us: Long)

  val GapUs: Long = 1800000000L // 30 minutes

  /** `events` needs (user_id, event_id, ts, us) with a watermark already
    * set on `ts`. Emits one row per CLOSED session (append mode).
    */
  def sessions(events: DataFrame): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("event_id"), col("us"), col("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            // watermark passed the gap horizon: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.n, s.start, s.end, s.end - s.start))
          } else {
            // within a micro-batch events arrive unordered — sort the
            // batch; cross-batch disorder is bounded by the watermark
            val evs = it.toSeq.sortBy(e => (e.us, e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            evs.foreach { e =>
              open match {
                case Some(o) if e.us - o.end > GapUs =>
                  closed += Session(user, o.n, o.start, o.end, o.end - o.start)
                  open = Some(Open(e.us, e.us, 1))
                case Some(o) =>
                  open = Some(Open(o.start, math.max(o.end, e.us), o.n + 1))
                case None =>
                  open = Some(Open(e.us, e.us, 1))
              }
            }
            open.foreach { o =>
              state.update(o)
              // fires once the watermark passes end + gap
              state.setTimeoutTimestamp((o.end + GapUs) / 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
