package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.{EventRow, Session}

class EventStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  private def ev(id: Long, minutes: Long, user: Long, typ: String,
      value: Double) = EventRow(id, ts(minutes), user, typ, value)

  test("watermarked hourly counts agree with the batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    val rows = Seq(
      ev(1, 5, 1, "click", 1.25), ev(2, 15, 2, "click", 2.5),
      ev(3, 70, 1, "view", 0.75), ev(4, 80, 3, "click", 1.0),
      ev(5, 130, 2, "view", 3.0))
    stream.addData(rows: _*)
    val q = EventStreams.hourlyCounts(stream.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hourly")
      .select("h", "event_type", "cnt", "val_cents")
      .as[(Timestamp, String, Long, Long)].collect().toSet
    // unified semantics: the same transform over the same rows as a batch
    val batch = EventStreams.hourlyCounts(rows.toDF())
      .as[(Timestamp, String, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.exists { case (_, t, c, cents) =>
      t == "click" && c == 2 && cents == 375 }) // hour 0 clicks: 125+250
  }

  test("late events beyond the watermark are dropped from the stream") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    stream.addData(ev(1, 5, 1, "click", 1.0), ev(2, 300, 1, "click", 1.0))
    val q = EventStreams.hourlyCounts(stream.toDF(), lateness = "1 hour")
      .writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    q.processAllAvailable()
    // watermark is now min 300 - 60 = 4h; an event at minute 10 is late
    stream.addData(ev(3, 10, 1, "click", 1.0))
    q.processAllAvailable()
    // push the watermark far past every window so all finalized rows emit
    stream.addData(ev(4, 1000, 1, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("late").select("h", "cnt")
      .as[(Timestamp, Long)].collect().toMap
    // the first window (hour floor of minute 5) finalized with ONE click —
    // the late minute-10 row vanished
    val hour0 = Timestamp.from(
      ts(5).toInstant.truncatedTo(java.time.temporal.ChronoUnit.HOURS))
    assert(out(hour0) == 1L)
  }

  test("sessionization: in-batch gap split and watermark-timeout close") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    // user 1: two events 5 min apart, then a 60-min gap (> 30) → the first
    // session closes inline; the second stays open in state
    stream.addData(ev(1, 0, 1, "c", 1.0), ev(2, 5, 1, "c", 2.0),
      ev(3, 65, 1, "c", 4.0))
    val q = EventStreams.sessionize(stream.toDS(), gapMinutes = 30,
        lateness = "1 hour")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    q.processAllAvailable()
    // advance the watermark far past session2's end+gap, then one more
    // batch so the event-time timeout fires and emits it
    stream.addData(ev(10, 400, 2, "c", 1.0))
    q.processAllAvailable()
    stream.addData(ev(11, 800, 2, "c", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sessions").as[Session].collect()
      .filter(_.user_id == 1L).sortBy(_.start.getTime)
    assert(out.length == 2)
    assert(out(0).n_events == 2 && out(0).total_cents == 300)
    assert(out(0).start == ts(0) && out(0).end == ts(5))
    assert(out(1).n_events == 1 && out(1).total_cents == 400)
  }


  test("streaming dedup gate: first-seen wins across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    final case class Doc(doc_id: Long, ts: Timestamp, text: String)
    val stream = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingDedup.firstSeen(
        stream.toDF().toDF("doc_id", "ts", "text"), "text", "ts")
      .writeStream.format("memory").queryName("dedup_gate")
      .outputMode("append").start()
    // batch 1: two distinct texts + an in-batch duplicate
    stream.addData((1L, ts(0), "alpha beta"), (2L, ts(1), "gamma"),
      (3L, ts(2), "alpha beta"))
    q.processAllAvailable()
    // batch 2: a cross-batch duplicate within the watermark + a new text
    stream.addData((4L, ts(10), "alpha beta"), (5L, ts(11), "delta"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_gate")
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    // first occurrence of each content hash, and only that one
    assert(out.map(_._2) == Set("alpha beta", "gamma", "delta"))
    assert(out.contains((1L, "alpha beta")) && !out.exists(_._1 == 3L) &&
      !out.exists(_._1 == 4L))
    // unified semantics: on a bounded batch the same transform is an
    // EXACT dedup (the downstream sweep's contract)
    val batchRows = Seq((1L, ts(0), "alpha beta"), (2L, ts(1), "gamma"),
      (3L, ts(2), "alpha beta"), (4L, ts(10), "alpha beta"),
      (5L, ts(11), "delta")).toDF("doc_id", "ts", "text")
    val batchOut = StreamingDedup.firstSeen(batchRows, "text", "ts")
      .select("text").as[String].collect().toSet
    assert(batchOut == Set("alpha beta", "gamma", "delta"))
  }
}
