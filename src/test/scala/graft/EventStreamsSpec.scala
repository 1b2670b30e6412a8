package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.EventStreams

/** Event-time window + watermark semantics (SURVEY.md §2.6 T2): the streaming
  * twin agrees with the batch plan, finalized windows emit exactly once in
  * append mode, and data older than the watermark is dropped.
  */
class EventStreamsSpec extends SparkTestBase {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(t: String, typ: String, v: Double): (Timestamp, String, Double) =
    (Timestamp.valueOf(t), typ, v)

  test("watermarked tumbling windows: finalize once, drop late data") {
    val ms = MemoryStream[(Timestamp, String, Double)]
    val events = ms.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.hourlyTypeCounts(events, lateness = "10 minutes")
      .writeStream.format("memory").queryName("ev_hourly")
      .outputMode("append").start()
    try {
      // batch 1: two rows in hour 00, one in hour 02 (advances max event time)
      ms.addData(ev("2024-01-01 00:10:00", "click", 1.0),
        ev("2024-01-01 00:20:00", "click", 2.0),
        ev("2024-01-01 02:00:00", "view", 5.0))
      q.processAllAvailable()
      // batch 2: watermark is now 01:50 → hour-00 window finalizes; the late
      // 00:30 row is behind the watermark and must NOT be merged
      ms.addData(ev("2024-01-01 00:30:00", "click", 100.0),
        ev("2024-01-01 03:30:00", "view", 7.0))
      q.processAllAvailable()
      // batch 3: watermark 03:20 → hour-02 window finalizes
      ms.addData(ev("2024-01-01 05:00:00", "view", 0.5))
      q.processAllAvailable()

      val byKey = spark.table("ev_hourly")
        .as[(String, String, Long, Double)].collect()
        .map { case (h, t, n, sv) => (h, t) -> ((n, sv)) }.toMap
      assert(byKey(("2024-01-01 00:00:00", "click")) == ((2L, 3.0))) // late row dropped
      assert(byKey(("2024-01-01 02:00:00", "view")) == ((1L, 5.0)))
      assert(!byKey.contains(("2024-01-01 05:00:00", "view"))) // still open
    } finally q.stop()
  }

  test("dedupEvents: re-deliveries within the watermark are dropped") {
    val ms = MemoryStream[(Long, Timestamp, Double)]
    val events = ms.toDF().toDF("event_id", "ts", "value")
    val q = EventStreams.dedupEvents(events, lateness = "10 minutes")
      .writeStream.format("memory").queryName("dedup_ev")
      .outputMode("append").start()
    def ts(t: String) = Timestamp.valueOf(t)
    try {
      ms.addData((1L, ts("2024-01-01 00:00:00"), 1.0),
        (2L, ts("2024-01-01 00:01:00"), 2.0),
        (1L, ts("2024-01-01 00:00:00"), 1.0)) // same-batch re-delivery
      q.processAllAvailable()
      ms.addData((1L, ts("2024-01-01 00:02:00"), 9.0)) // cross-batch re-delivery
      q.processAllAvailable()
      val rows = spark.table("dedup_ev")
        .as[(Long, Timestamp, Double)].collect().toSeq
      assert(rows.count(_._1 == 1L) == 1, "event 1 must survive exactly once")
      assert(rows.find(_._1 == 1L).get._3 == 1.0, "first delivery wins")
      assert(rows.count(_._1 == 2L) == 1)
    } finally q.stop()
  }

  test("sessionize: gap splits, timeout closes, state evicts (T3)") {
    val ms = MemoryStream[(Long, Timestamp)]
    val events = ms.toDF().toDF("user_id", "ts")
    val q = EventStreams.sessionize(events, gapMinutes = 30, lateness = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    def ts(t: String) = Timestamp.valueOf(t)
    try {
      // user 1: two events 10 min apart (one session), then a 2h jump in the
      // SAME batch → first session closes immediately via the gap rule
      ms.addData((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:10:00")),
        (1L, ts("2024-01-01 02:30:00")))
      q.processAllAvailable()
      val afterBatch1 = spark.table("sessions")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(afterBatch1 == Set(
        (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"), 2L)))

      // user 2 appears far in the future → watermark advances past user 1's
      // open session end + gap → event-time timeout closes it
      ms.addData((2L, ts("2024-01-01 06:00:00")))
      q.processAllAvailable()
      ms.addData((2L, ts("2024-01-01 06:01:00"))) // one more batch so timeouts fire
      q.processAllAvailable()
      val afterTimeout = spark.table("sessions")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(afterTimeout.contains(
        (1L, ts("2024-01-01 02:30:00"), ts("2024-01-01 02:30:00"), 1L)))
    } finally q.stop()
  }

  test("sessionize agrees with the batch userSessions rollup on the same data") {
    val data = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:10:00"),
      (1L, "2024-01-01 02:30:00"), (1L, "2024-01-01 02:45:00"),
      (2L, "2024-01-01 01:00:00"))
      .map { case (u, t) => (u, Timestamp.valueOf(t)) }
    val ms = MemoryStream[(Long, Timestamp)]
    val q = EventStreams.sessionize(ms.toDF().toDF("user_id", "ts"),
      gapMinutes = 30, lateness = "0 seconds")
      .writeStream.format("memory").queryName("sess_twin")
      .outputMode("append").start()
    try {
      ms.addData(data: _*)
      q.processAllAvailable()
      // close everything with a far-future watermark bump + a flushing batch
      ms.addData((99L, Timestamp.valueOf("2024-02-01 00:00:00")))
      q.processAllAvailable()
      ms.addData((99L, Timestamp.valueOf("2024-02-01 00:01:00")))
      q.processAllAvailable()
      val streamed = spark.table("sess_twin")
        .filter($"user_id" < 99)
        .groupBy($"user_id")
        .agg(org.apache.spark.sql.functions.sum($"n_events").as("n_events"),
          org.apache.spark.sql.functions.count_distinct($"session_start").as("n_sessions"))
        .as[(Long, Long, Long)].collect().toSet
      val batch = graft.operators.EventAnalytics
        .userSessionsOf(data.toDF("user_id", "ts"))
        .select($"user_id", $"n_events", $"n_sessions")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("sessionize: sub-second gaps at the boundary split/merge by microseconds") {
    // gap of 1800.8 s must SPLIT (old whole-second floor-diff said 1800 →
    // merge); gap of 1799.5 s must MERGE — in the batch form AND streaming twin
    val data = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:30:00.8"),
      (2L, "2024-01-01 00:00:00.5"), (2L, "2024-01-01 00:30:00"))
      .map { case (u, t) => (u, Timestamp.valueOf(t)) }
    val batch = graft.operators.EventAnalytics
      .userSessionsOf(data.toDF("user_id", "ts"))
      .select($"user_id", $"n_sessions")
      .as[(Long, Long)].collect().toMap
    assert(batch == Map(1L -> 2L, 2L -> 1L))

    val ms = MemoryStream[(Long, Timestamp)]
    val q = EventStreams.sessionize(ms.toDF().toDF("user_id", "ts"),
      gapMinutes = 30, lateness = "0 seconds")
      .writeStream.format("memory").queryName("sess_subsec")
      .outputMode("append").start()
    try {
      ms.addData(data: _*)
      q.processAllAvailable()
      ms.addData((99L, Timestamp.valueOf("2024-02-01 00:00:00")))
      q.processAllAvailable()
      ms.addData((99L, Timestamp.valueOf("2024-02-01 00:01:00")))
      q.processAllAvailable()
      val streamed = spark.table("sess_subsec")
        .filter($"user_id" < 99)
        .groupBy($"user_id")
        .agg(org.apache.spark.sql.functions.count_distinct($"session_start").as("n_sessions"))
        .as[(Long, Long)].collect().toMap
      assert(streamed == batch)
      // session bounds keep microsecond precision through the state round-trip
      val bounds = spark.table("sess_subsec").filter($"user_id" === 2L)
        .select($"session_start", $"session_end")
        .as[(Timestamp, Timestamp)].collect().head
      assert(bounds == (Timestamp.valueOf("2024-01-01 00:00:00.5"),
        Timestamp.valueOf("2024-01-01 00:30:00")))
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against the dimension") {
    val dim = Seq(("click", 1.0), ("purchase", 10.0))
      .toDF("event_type", "weight")
    val ms = MemoryStream[(Long, String)]
    val q = EventStreams.enrichEvents(
      ms.toDF().toDF("event_id", "event_type"), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      ms.addData((1L, "click"), (2L, "purchase"), (3L, "error")) // error: no dim row
      q.processAllAvailable()
      ms.addData((4L, "click")) // second batch re-joins the static side
      q.processAllAvailable()
      val out = spark.table("enriched")
        .select($"event_id", $"weight").as[(Long, Double)].collect().toSet
      assert(out == Set((1L, 1.0), (2L, 10.0), (4L, 1.0))) // inner: 3 dropped
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with in-window clicks") {
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val q = EventStreams.purchaseClickPairs(
      clicks.toDF().toDF("event_id", "user_id", "ts"),
      purchases.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName("pc_pairs")
      .outputMode("append").start()
    try {
      clicks.addData(
        (1L, 7L, Timestamp.valueOf("2024-01-01 10:00:00")), // in window
        (2L, 7L, Timestamp.valueOf("2024-01-01 10:30:00")), // in window
        (3L, 7L, Timestamp.valueOf("2024-01-01 09:30:00")), // 75 min before → out
        (4L, 8L, Timestamp.valueOf("2024-01-01 10:40:00"))) // other user
      purchases.addData(
        (10L, 7L, Timestamp.valueOf("2024-01-01 10:45:00")),
        (11L, 9L, Timestamp.valueOf("2024-01-01 10:45:00"))) // no clicks → no row
      q.processAllAvailable()
      val pairs = spark.table("pc_pairs")
        .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
      assert(pairs == Set((10L, 1L), (10L, 2L)))
      // batch twin on the same rows produces the same attribution
      val ev = Seq(
        (1L, 7L, "click", "2024-01-01 10:00:00"),
        (2L, 7L, "click", "2024-01-01 10:30:00"),
        (3L, 7L, "click", "2024-01-01 09:30:00"),
        (4L, 8L, "click", "2024-01-01 10:40:00"),
        (10L, 7L, "purchase", "2024-01-01 10:45:00"),
        (11L, 9L, "purchase", "2024-01-01 10:45:00"))
        .map { case (e, u, t, s) => (e, u, t, Timestamp.valueOf(s)) }
        .toDF("event_id", "user_id", "event_type", "ts")
      val p = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id", $"ts")
      val c = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id", $"ts".as("c_start"),
          ($"ts" + org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR")).as("c_end"))
      val batchPairs = graft.operators.RangeJoin.joinRange(
        p, c, key = "user_id", time = "ts", start = "c_start", end = "c_end",
        payload = Seq("click_id"), bucketWidthSec = 3600L)
        .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
      assert(batchPairs == pairs)
    } finally q.stop()
  }

  test("streaming twin agrees with the batch plan on the same data") {
    val data = Seq(
      ev("2024-01-01 00:10:00", "click", 1.0),
      ev("2024-01-01 00:40:00", "view", 2.5),
      ev("2024-01-01 01:15:00", "click", 4.0))

    val ms = MemoryStream[(Timestamp, String, Double)]
    val q = EventStreams.hourlyTypeCounts(ms.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("ev_twin")
      .outputMode("complete").start()
    try {
      ms.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("ev_twin")
        .as[(String, String, Long, Double)].collect().toSet
      // batch twin: same expressions, date_trunc form (EventAnalytics shape)
      import org.apache.spark.sql.functions._
      val batch = data.toDF("ts", "event_type", "value")
        .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
