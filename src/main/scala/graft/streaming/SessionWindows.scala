package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class SessionEvent(user_id: Long, event_id: Long, us: Long)
case class SessionState(startUs: Long, lastUs: Long, n: Long)
case class ClosedSession(user_id: Long, session_start_us: Long,
    session_end_us: Long, n_events: Long)

/** Streaming sessionization with custom state (§2#14's streaming twin):
  * `flatMapGroupsWithState` keyed by user, emitting a session whenever a
  * new event arrives more than `gapUs` after the last one. State per
  * key is one SessionState — constant size, so state store growth is
  * O(active users), not O(events).
  *
  * The batch twin (StreamOps.sessionize) is the oracle-checked form;
  * this one runs under a real StreamingQuery.
  */
object SessionWindows {

  def sessionize(events: Dataset[SessionEvent], gapUs: Long = 1800000000L)
      (implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.us, e.event_id))
          var cur = state.getOption
          val closed = Seq.newBuilder[ClosedSession]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.us - s.lastUs <= gapUs =>
                cur = Some(SessionState(s.startUs, e.us, s.n + 1))
              case Some(s) =>
                closed += ClosedSession(userId, s.startUs, s.lastUs, s.n)
                cur = Some(SessionState(e.us, e.us, 1))
              case None =>
                cur = Some(SessionState(e.us, e.us, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}
