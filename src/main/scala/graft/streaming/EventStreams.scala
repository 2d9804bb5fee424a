package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

// Top-level on purpose (janino cannot resolve Outer$Inner accessors in
// generated code — for state-store encoders the failure is FATAL, not an
// interpreted fallback; same lesson as index.DocRow)
final case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
    n_events: Long, total_cents: Long)

private[streaming] final case class SessionState(start: Long, end: Long,
    n: Long, cents: Long)

/** Streaming event analytics — the watermark + windowed-aggregation and
  * custom-state shapes of the training-data pipeline (SURVEY §2.11 beyond
  * ingest): the same hourly rollup the batch contract runs
  * (q_events_hourly) expressed over an unbounded stream with BOUNDED
  * state, plus gap-based sessionization via flatMapGroupsWithState.
  *
  * Both transforms work identically on a batch DataFrame (Spark's
  * unified semantics) — the specs drive them through MemoryStream AND
  * assert batch/stream agreement on the same rows.
  */
object EventStreams {

  /** Hourly (window, event_type) counts + value cents with a watermark:
    * events later than `lateness` behind the max seen ts are dropped and
    * their window state is evicted — the property that keeps state finite
    * on an unbounded 100 TB stream. Output matches q_events_hourly's
    * shape with the window start as the hour column.
    */
  def hourlyCounts(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("val_cents"))
      .select(col("w.start").as("h"), col("event_type"), col("cnt"),
        col("val_cents"))

  /** Gap-based sessionization: a user's events belong to one session while
    * consecutive events are within `gapMinutes`; a session closes (emits)
    * when the event-time watermark passes its end + gap — bounded state
    * via GroupStateTimeout.EventTimeTimeout, the
    * KeyValueGroupedDataset.flatMapGroupsWithState shape.
    *
    * Deterministic within a micro-batch: events sort by (ts, event_id)
    * before folding into the state.
    */
  def sessionize(events: Dataset[EventRow], gapMinutes: Int = 30,
      lateness: String = "2 hours"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[EventRow], state: GroupState[SessionState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            // watermark passed the session's end + gap: emit and clear
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start),
              new Timestamp(s.end), s.n, s.cents))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            for (e <- sorted) {
              val t = e.ts.getTime
              val cents = math.round(e.value * 100)
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t),
                    s.n + 1, s.cents + cents))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start),
                    new Timestamp(s.end), s.n, s.cents)
                  cur = Some(SessionState(t, t, 1, cents))
                case None =>
                  cur = Some(SessionState(t, t, 1, cents))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
