package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

/** Batch event analytics added in round 9: the ordered conversion funnel's
  * sequential-minimum semantics and the cohort grid's exact week offsets.
  * (The earlier event entries are covered by their oracles + the streaming
  * twins in EventStreamsSpec.)
  */
class EventAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("conversionFunnel: order matters, chains break, firsts win") {
    import graft.sources.Tables
    val funnel = EventAnalytics.conversionFunnel(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getInt(4))).toMap
    // structural invariants on the fixture: stage timestamps are ordered
    // and the stage count matches the nulls
    funnel.values.foreach { case (v, c, p, n) =>
      assert(v != null)
      // second-truncated rendering: strict order holds on the underlying
      // ts, so the formatted strings are non-decreasing
      if (c != null) assert(c >= v)
      if (p != null) { assert(c != null && p >= c) }
      assert(n == 1 + (if (c != null) 1 else 0) + (if (p != null) 1 else 0))
    }
    // the fixture reaches every stage depth somewhere
    val depths = funnel.values.map(_._4).toSet
    assert(depths == Set(1, 2, 3) || depths == Set(2, 3) || depths == Set(3),
      s"unexpected depth set $depths")
    // every funnel user actually has a view event
    val viewers = Tables.events(spark, sf)
      .filter($"event_type" === "view" && $"user_id".isNotNull)
      .select($"user_id").distinct().as[Long].collect().toSet
    assert(funnel.keySet == viewers)
  }

  test("cohortRetention: offset-0 cell covers each cohort; offsets non-negative") {
    val grid = EventAnalytics.cohortRetention(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(grid.nonEmpty)
    grid.foreach { case (_, off, n) =>
      assert(off >= 0, s"negative week offset $off")
      assert(n > 0)
    }
    // week 0 exists for every cohort (a user is active in their own first
    // week by definition) and is each cohort's maximum cell
    grid.groupBy(_._1).foreach { case (cw, cells) =>
      val byOff = cells.map(c => c._2 -> c._3).toMap
      assert(byOff.contains(0L), s"cohort $cw missing offset 0")
      assert(byOff(0L) == byOff.values.max,
        s"cohort $cw: offset-0 cell is not the cohort size")
    }
  }

  test("sessionPaths: counts conserve to the session total; paths are well-formed") {
    import org.apache.spark.sql.functions._
    val paths = EventAnalytics.sessionPaths(spark, sf, k = 1000000).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(paths.nonEmpty)
    val types = Set("view", "click", "purchase", "signup", "error")
    paths.foreach { case (p, n) =>
      assert(n >= 1)
      assert(p.split(">").forall(types.contains), p)
    }
    // Σ path counts = number of sessions (uncapped k)
    val nSessions = EventAnalytics.userSessionsOf(
      graft.sources.Tables.events(spark, sf).filter($"user_id".isNotNull))
      .agg(sum($"n_sessions")).collect()(0).getLong(0)
    assert(paths.map(_._2).sum == nSessions,
      s"${paths.map(_._2).sum} path-sessions vs $nSessions sessions")
  }

  test("eventTransitions: counts conserve, rows normalize to 1") {
    import org.apache.spark.sql.functions._
    val t = EventAnalytics.eventTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(t.nonEmpty)
    // Σ transitions = Σ_user (n_events − 1): every adjacent pair, no more
    val perUser = graft.sources.Tables.events(spark, sf)
      .filter($"user_id".isNotNull)
      .groupBy($"user_id").count().collect().map(_.getLong(1))
    assert(t.map(_._3).sum == perUser.map(_ - 1).sum)
    t.groupBy(_._1).foreach { case (et, g) =>
      val psum = g.map(_._4).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"$et rows sum to $psum")
    }
  }
}
