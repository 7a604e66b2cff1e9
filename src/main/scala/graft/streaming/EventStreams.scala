package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming analytics over an event stream
  * (`event_id, ts, user_id, event_type, value`) — the streaming-native side
  * the reference lacks entirely (SURVEY.md §2.10): event-time tumbling
  * windows under a watermark, and custom sessionization state via
  * `flatMapGroupsWithState`.
  */
object EventStreams {

  /** Tumbling event-time window counts with a watermark: late events
    * beyond `watermark` are dropped, windows finalize (append mode) once
    * the watermark passes their end. */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
                     windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total"))

  final case class SessionEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, startMs: Long, endMs: Long, nEvents: Int)

  /** Gap-based sessionization with explicit state: a user's session is
    * closed (emitted once) when a later event arrives more than `gapMs`
    * after the session's last event — purely event-driven state, so the
    * output is deterministic in event time (no wall-clock timeouts). */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long = 30 * 60 * 1000L)
  : Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var closed = Vector.empty[Session]
          var cur = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last <= gapMs =>
                cur = Some(SessionState(s.start, t, s.n + 1))
              case Some(s) =>
                closed :+= Session(user, s.start, s.last, s.n)
                cur = Some(SessionState(t, t, 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
  }
}
