package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Mutable-session accumulator carried in stream state. Top-level (not
  * nested in the object) so the state encoder's generated code can
  * construct it.
  */
final case class SessionState(start: Long, end: Long, n: Long, total: Double)

/** Structured Streaming surface (SURVEY.md §7.1 item 8): the true
  * streaming analogues of the batch `graft.operators.Events` queries.
  * Transforms are expressed as Dataset→Dataset functions so they run
  * identically on `readStream` sources in production and on
  * MemoryStream in tests; the driver's oracle checks the batch twins
  * instead (a streaming sink can't be hash-compared).
  *
  * Scale notes: both operators keyed-partition by user/window —
  * state is sharded across executors by the shuffle, watermarks bound
  * state size, and `flatMapGroupsWithState` evicts sessions on event-
  * time timeout, so state never grows with total history, only with
  * concurrently-open keys.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long, total_value: Double)

  /** Tumbling-window counts with a watermark: late data beyond
    * `watermark` is dropped, windows finalize (append mode) once the
    * watermark passes their end.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Gap-based sessionization with explicit state: sessions close
    * after `gapSeconds` of user inactivity (event-time, enforced via
    * watermark timeout). The streaming twin of
    * `graft.operators.Events.sessions`.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
                 watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    def update(userId: Long, batch: Iterator[Event],
               state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total))
      }
      val events = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var emitted = List.empty[Session]
      var cur = state.getOption
      events.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t < s.start - gapMs =>
            // Out-of-order event MORE than a gap before the open
            // session: in event-time order it is its own session
            // (the batch twin splits on the t → s.start gap). It is
            // emitted closed immediately — by watermark contract no
            // still-older event can arrive to extend it.
            emitted ::= Session(userId, new Timestamp(t), new Timestamp(t), 1L, e.value)
          case Some(s) if t - s.end <= gapMs =>
            // min() on start: an out-of-order event within the gap
            // BEFORE the session start extends it backwards (matches
            // the batch twin).
            cur = Some(SessionState(math.min(s.start, t), math.max(s.end, t), s.n + 1, s.total + e.value))
          case Some(s) => // gap exceeded → close previous, open new
            emitted ::= Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total)
            cur = Some(SessionState(t, t, 1L, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1L, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.end + gapMs)
      }
      emitted.reverseIterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
