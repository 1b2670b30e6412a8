package graft

import java.sql.Timestamp

import graft.operators.{EventAnalytics, RangeJoin}
import graft.sources.Tables

/** Bucketed range-join semantics: containment bounds inclusive, intervals
  * spanning grid buckets still match, overlapping intervals each match, and
  * the session-attribution query conserves events. The fixture-scale value
  * check is the DuckDB inequality-join oracle ("event_session_attribution").
  */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("joinRange: inclusive bounds, cross-bucket intervals, overlap, no-match") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "at-start"),   // == interval start
      (1L, ts("2024-01-01 13:30:00"), "mid"),        // interval spans buckets
      (1L, ts("2024-01-01 14:00:00"), "at-end"),     // == interval end
      (1L, ts("2024-01-01 20:00:00"), "outside"),    // no interval
      (2L, ts("2024-01-01 10:30:00"), "overlap")     // two containing intervals
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 14:00:00"), 100L),
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 200L),
      (2L, ts("2024-01-01 10:15:00"), ts("2024-01-01 10:45:00"), 201L)
    ).toDF("k", "s", "e", "iv")

    val out = RangeJoin.joinRange(left, right, key = "k", time = "t",
      start = "s", end = "e", payload = Seq("iv"), bucketWidthSec = 3600L)
      .select($"tag", $"iv").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(out == Map(
      "at-start" -> Set(100L),
      "mid" -> Set(100L),
      "at-end" -> Set(100L),
      "overlap" -> Set(200L, 201L))) // "outside" absent (inner join)
  }

  test("session attribution conserves events, one session each") {
    val n = Tables.events(spark, sf).count()
    val attributed = RangeJoin.eventSessionAttribution(spark, sf)
    assert(attributed.count() == n) // disjoint sessions: exactly one match per event
    assert(attributed.select($"event_id").distinct().count() == n)
    // per-user session counts agree with the rollup's n_sessions
    val fromAttribution = attributed.groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.countDistinct($"session_id").as("n"))
      .as[(Long, Long)].collect().toMap
    val fromRollup = EventAnalytics.userSessions(spark, sf)
      .select($"user_id", $"n_sessions").as[(Long, Long)].collect().toMap
    assert(fromAttribution == fromRollup)
  }
}
