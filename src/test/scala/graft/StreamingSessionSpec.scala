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

  test("a late event joins the open session without regressing the gap baseline") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.sessionized(mem.toDS()).writeStream
      .format("memory").queryName("late_test")
      .outputMode(OutputMode.Append()).start()
    try {
      val gap = Streams.GapUs
      // base offset: the stateful operator's late-row filter drops events
      // with ts <= the current watermark, and the watermark floor is 0 —
      // an event AT epoch 0 would be discarded before reaching the
      // sessionizer, so the scenario starts a day in
      val b = 86400L * 1000000L
      mem.addData(Event(1L, b, 1L), Event(1L, b + gap * 3, 2L)) // two sessions
      q.processAllAvailable()
      // late arrival (before even session 1's start, but above the
      // watermark b+90min-2h = b-30min so it clears the late-row filter),
      // then an on-time event 1s after the open session's last: both must
      // be session 2 — the late event must NOT drag lastTs backward and
      // split them
      mem.addData(Event(1L, b + 1000L, 3L),
        Event(1L, b + gap * 3 + 1000000L, 4L))
      q.processAllAvailable()
      val got = s.table("late_test").as[SessionedEvent]
        .collect().map(e => e.event_id -> e.session_num).toMap
      assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 2L), got.toString)
    } finally q.stop()
  }

  test("stream-stream join matches clicks to purchases within the bound") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, Long)]
    val buys = MemoryStream[(java.sql.Timestamp, Long)]
    val cdf = clicks.toDS().toDF("c_ts", "c_user").withWatermark("c_ts", "1 hour")
    val bdf = buys.toDS().toDF("b_ts", "b_user").withWatermark("b_ts", "1 hour")
    // purchase joins clicks by the same user in the preceding 30 minutes
    val joined = bdf.join(cdf,
      col("b_user") === col("c_user") &&
        col("c_ts") >= col("b_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("b_ts"))
      .select(col("b_user"), col("b_ts").cast("long").as("b"),
        col("c_ts").cast("long").as("c"))
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode(OutputMode.Append()).start()
    try {
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      clicks.addData((ts(0), 1L), (ts(40), 1L), (ts(5), 2L))
      buys.addData((ts(50), 1L), (ts(45), 2L))
      q.processAllAvailable()
      val got = s.table("ssj_test").as[(Long, Long, Long)].collect().toSet
      // user 1: purchase 10:50 matches click 10:40 (not 10:00, outside 30m);
      // user 2: purchase 10:45 has no click in [10:15, 10:45]
      assert(got == Set((1L, ts(50).getTime / 1000, ts(40).getTime / 1000)),
        got.toString)
    } finally q.stop()
  }

  test("windowed agg with watermark drops events later than the threshold") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val agg = mem.toDS().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("win"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").cast("long").as("start"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode(OutputMode.Append()).start()
    try {
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      mem.addData((ts(0), 1L), (ts(5), 2L))
      q.processAllAvailable()
      // advance the watermark past the first window...
      mem.addData((ts(25), 3L))
      q.processAllAvailable()
      // ...then send an event into the now-closed first window: dropped
      mem.addData((ts(1), 4L), (ts(26), 5L))
      q.processAllAvailable()
      mem.addData((ts(45), 6L)) // close the remaining windows
      q.processAllAvailable()
      val got = s.table("wm_test").as[(Long, Long)].collect().toMap
      val base = ts(0).getTime / 1000
      assert(got(base) == 2L, s"late event leaked into closed window: $got")
    } finally q.stop()
  }

  test("sessionizer state expires once the watermark passes the inactivity gap") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.sessionized(mem.toDS()).writeStream
      .format("memory").queryName("expiry_test")
      .outputMode(OutputMode.Append()).start()
    def stateRows: Long = q.recentProgress
      .filter(_.stateOperators.nonEmpty)
      .lastOption.map(_.stateOperators.head.numRowsTotal).getOrElse(-1L)
    try {
      val day = 86400L * 1000000L
      // day-one base: an event at epoch 0 would be <= the initial
      // watermark and dropped by the stateful operator's late-row filter
      mem.addData(Event(1L, day, 1L))
      q.processAllAvailable()
      assert(stateRows == 1L, s"expected user 1's open session, got $stateRows")
      // user 2 ten days later: the watermark (11d − 2h lateness) passes
      // user 1's lastTs + gap, so user 1's state must be reclaimed in the
      // following (possibly no-data) micro-batch
      mem.addData(Event(2L, 11 * day, 2L))
      q.processAllAvailable()
      mem.addData(Event(2L, 11 * day + 1000000L, 3L))
      q.processAllAvailable()
      assert(stateRows == 1L,
        s"idle user's state not reclaimed after watermark passed: $stateRows rows")
      // a returning expired user restarts the ordinal at 1 (the old
      // state is gone — that's the point); session_start_us still
      // uniquely identifies the new session
      mem.addData(Event(1L, 21 * day, 4L))
      q.processAllAvailable()
      val got = s.table("expiry_test").as[SessionedEvent].collect()
      assert(got.length == 4, s"timeout must emit nothing: ${got.length} rows")
      val e4 = got.find(_.event_id == 4L).get
      assert(e4.session_num == 1L && e4.session_start_us == 21 * day,
        e4.toString)
    } finally q.stop()
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
      // day-one base: see the late-row filter note in the tests above
      val b = 86400L * 1000000L
      // batch 1: two events 1s apart -> one session
      mem.addData(Event(1L, b, 1L), Event(1L, b + 1000000L, 2L))
      q.processAllAvailable()
      // batch 2: one event inside the gap (same session), one past it (new)
      mem.addData(Event(1L, b + 2000000L, 3L),
        Event(1L, b + 2000000L + gap + 1L, 4L))
      q.processAllAvailable()
      val got = s.table("sessions_test").as[SessionedEvent]
        .collect().map(e => e.event_id -> e.session_num).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L), got.toString)
    } finally q.stop()
  }
}
