package graft

import graft.streaming.Streams
import graft.streaming.Streams.{Event, SessionedEvent}
import graft.operators.TextAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The stateful flatMapGroupsWithState sessionizer: agrees with the batch
  * window-based sessionizer on real data, and carries open-session state
  * across micro-batches on a live stream.
  */
class StreamingSessionSpec extends SparkSpec {

  test("stateful sessionizer matches batch sessionize on sf0.001") {
    val s = spark
    import s.implicits._
    val events = Tables.events(s, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"))
      .as[Event]
    val stateful = Streams.sessionized(events)
      .collect().map(e => (e.event_id, e.session_num)).toMap
    val batch = TextAnalysis.sessionize(s, sf)
      .select("event_id", "session_num").as[(Long, Long)].collect().toMap
    assert(stateful.size == batch.size)
    val diffs = batch.collect {
      case (id, sn) if stateful(id) != sn => (id, sn, stateful(id))
    }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(5)}")
  }

  test("state carries open sessions across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.sessionized(mem.toDS()).writeStream
      .format("memory").queryName("sessions_test")
      .outputMode(OutputMode.Append()).start()
    try {
      val gap = Streams.GapUs
      // batch 1: two events 1s apart -> one session
      mem.addData(Event(1L, 0L, 1L), Event(1L, 1000000L, 2L))
      q.processAllAvailable()
      // batch 2: one event inside the gap (same session), one past it (new)
      mem.addData(Event(1L, 2000000L, 3L), Event(1L, 2000000L + gap + 1L, 4L))
      q.processAllAvailable()
      val got = s.table("sessions_test").as[SessionedEvent]
        .collect().map(e => e.event_id -> e.session_num).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L), got.toString)
    } finally q.stop()
  }
}
