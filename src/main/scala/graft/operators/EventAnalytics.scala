package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols._

/** Event-stream analytics in batch form — the same plans the streaming twins
  * in [[graft.streaming.EventStreams]] run incrementally (SURVEY.md §2.6 T2);
  * the batch form is what the DuckDB oracle can check, and the spec asserts
  * both forms agree on the same rows.
  */
object EventAnalytics {

  /** Tumbling 1-hour event-time window counts per event type. Rendered with
    * date_trunc (not the `window()` struct) so the oracle SQL is identical;
    * the streaming twin groups by window($"ts", "1 hour") — same hash-agg
    * shape, one shuffle on (hour, type). */
  def hourlyTypeCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        $"event_type")
      .agg(count(lit(1)).as("n"),
        round(sum($"value"), 2).as("sum_value"))
      .orderBy($"hour_start", $"event_type")

  /** JSON scalar extraction from the props column + aggregate. get_json_object
    * is a codegen'd built-in — no UDF in the hot path. */
  def jsonPropsAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select($"event_type", get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(sum($"k").as("sum_k"),
        count($"k").as("n_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")

  /** Gap-based sessionization, batch form: a session ends after `gapMinutes`
    * of per-user inactivity. One lag + one running sum over the same
    * (user_id, ts) window — a single shuffle on user_id; the flag/id
    * computation is pipelined inside one window operator. Tie-safe: equal
    * timestamps give gap 0 regardless of tie order, so session ids are
    * deterministic over the multiset of events. The streaming twin
    * ([[graft.streaming.EventStreams.sessionize]]) computes the same sessions
    * incrementally with flatMapGroupsWithState.
    *
    * Scale note: the window partitions by user_id (high cardinality — no
    * skew-by-construction), unlike a rank over a 5-value key; state per task
    * is one partition's rows, spillable by the sort-based window exec.
    */
  def userSessions(spark: SparkSession, sfDir: String): DataFrame =
    userSessionsOf(Tables.events(spark, sfDir))

  /** Shared session-id assignment: (user_id, ts, sid) with sid counting
    * gap-boundary crossings per user. The ONE definition of "session" —
    * [[userSessionsOf]], [[sessionIntervalsOf]], and (through them) the
    * range-join attribution all derive from it, so the gap semantics can
    * never desynchronize between the rollup and the intervals.
    *
    * Microsecond gap comparison: unix_timestamp truncates to whole
    * seconds, which mis-classifies sub-second gaps straddling the boundary
    * (the DuckDB oracle uses epoch_us — both floor ns→µs identically). */
  private def withSessionIds(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts")
    val prev = lag($"ts", 1).over(w)
    val flag = when(prev.isNull ||
      unix_micros($"ts") - unix_micros(prev) > gapMinutes * 60000000L, 1L)
      .otherwise(0L)
    events
      .select($"user_id", $"ts")
      .withColumn("flag", flag)
      .withColumn("sid", sum($"flag").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("flag")
  }

  /** Core of [[userSessions]] over any (user_id, ts) frame. */
  def userSessionsOf(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    withSessionIds(events, gapMinutes)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        max($"sid").as("n_sessions"),
        // +1e-9 nudge as everywhere else a rounded ratio crosses engines:
        // exact half-way 4-dp quotients round differently in Spark
        // (decimal-string HALF_UP) vs DuckDB (binary scale-then-round)
        round(count(lit(1)).cast("double") / max($"sid") + 1e-9, 4).as("avg_session_events"))
      .orderBy($"user_id")
  }

  /** Session INTERVALS (one row per session) rather than the per-user
    * rollup: (user_id, session_id, session_start, session_end, n_events).
    * Same flag/running-sum machinery as [[userSessionsOf]] — one shuffle on
    * user_id — plus a (user_id, sid) hash-agg that reuses the window's
    * partitioning. Feeds the range join ([[RangeJoin]]): events → their
    * containing session. */
  def sessionIntervalsOf(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    withSessionIds(events, gapMinutes)
      .withColumnRenamed("sid", "session_id")
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("session_start"),
        max($"ts").as("session_end"),
        count(lit(1)).as("n_events"))

  /** Exact value quartiles per event type (linear interpolation — the same
    * definition DuckDB's quantile_cont uses, so the oracle compares
    * value-for-value after rounding). Exact percentile buffers each group's
    * values; at 100 TB swap in `approx_percentile` (t-digest, fixed-size
    * state, same call shape) — the exact form is the correctness anchor the
    * approximate path is measured against. */
  def valueQuantiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(
        round(expr("percentile(value, 0.25)") + 1e-9, 4).as("p25"),
        round(expr("percentile(value, 0.5)") + 1e-9, 4).as("p50"),
        round(expr("percentile(value, 0.75)") + 1e-9, 4).as("p75"),
        round(expr("percentile(value, 0.95)") + 1e-9, 4).as("p95"))
      .orderBy($"event_type")

  /** The quantile SCALE path: `approx_percentile` (t-digest-style sketch —
    * fixed-size state per group, mergeable map-side, no per-group value
    * buffer), same call shape as the exact form. Registered rows-only (the
    * sketch is engine-specific); the spec measures its error against
    * [[valueQuantiles]], which is the correctness anchor. `accuracy` 10000
    * bounds rank error at 1/10000 of the group. */
  def valueQuantilesApprox(spark: SparkSession, sfDir: String,
      accuracy: Int = 10000): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(
        round(expr(s"approx_percentile(value, 0.25, $accuracy)") + 1e-9, 4).as("p25"),
        round(expr(s"approx_percentile(value, 0.5, $accuracy)") + 1e-9, 4).as("p50"),
        round(expr(s"approx_percentile(value, 0.75, $accuracy)") + 1e-9, 4).as("p75"),
        round(expr(s"approx_percentile(value, 0.95, $accuracy)") + 1e-9, 4).as("p95"))
      .orderBy($"event_type")

  /** HASH-CHECKED error envelope for the quantile sketch (see
    * [[graft.operators.Relational.distinctPartsEnvelope]] for the
    * pattern): exact per-type percentiles plus booleans asserting each
    * approx percentile lands within `tol` relative of its exact twin.
    * approx_percentile returns an actual data value (no interpolation), so
    * the band must absorb one local value gap — 5% of (|exact| + 1) is
    * generous without being vacuous at ~200 values per group. DuckDB
    * replays the exact side and literal TRUEs; a sketch out of band flips
    * a boolean and the hash goes red.
    */
  def valueQuantilesEnvelope(spark: SparkSession, sfDir: String,
      tol: Double = 0.05): DataFrame = {
    val exact = valueQuantiles(spark, sfDir)
    val qs = Seq("p25", "p50", "p75", "p95")
    val approx = valueQuantilesApprox(spark, sfDir)
      .select($"event_type" +: qs.map(q => col(q).as(s"a_$q")): _*)
    exact.join(broadcast(approx), "event_type")
      .select($"event_type" +: qs.map(col) ++: qs.map(q =>
        (abs(col(s"a_$q") - col(q)) <= lit(tol) * (abs(col(q)) + 1.0))
          .as(s"${q}_within_tol")): _*)
      .orderBy($"event_type")
  }

  /** Per-type k-sigma outlier detection — the metric-cleaning staple — in
    * EXACT integer arithmetic: values are 2-decimal currency, so with
    * c = round(value·100) (exact cents), S = Σc, Q = Σc², the test
    * (x − μ)² > k²σ² is equivalent to (n·c − S)² > k²·(n·Q − S²), every
    * term an integer. Products run in decimal(38,0) (decimal128 — DuckDB
    * mirrors them in HUGEINT), so the comparison is exact on both engines:
    * no float mean, no float variance, no summation-order divergence, no
    * boundary flips. A float z-score would make borderline rows
    * engine-dependent; the integer form makes the oracle bit-exact.
    *
    * Scale: one hash-agg for the per-type moments (5 rows), broadcast back,
    * then a per-row filter — the events table never shuffles.
    */
  def valueOutliers(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"event_type", $"value",
        round($"value" * 100).cast("long").as("c"))
    val stats = ev.groupBy($"event_type").agg(
      count(lit(1)).as("n"), sum($"c").as("s"), sum($"c" * $"c").as("q"))
    val d = "decimal(20,0)"
    val dev = $"n".cast(d) * $"c".cast(d) - $"s".cast(d)
    val varTimesN2 = $"n".cast(d) * $"q".cast(d) - $"s".cast(d) * $"s".cast(d)
    ev.join(broadcast(stats), "event_type")
      .filter(dev * dev > lit(k.toLong * k) * varTimesN2)
      .select($"event_id", $"event_type", $"value")
  }

  /** Sessionless per-user rollup: activity span + volume per user. */
  def userActivity(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
        date_format(max($"ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        round(sum($"value"), 2).as("total_value"))
      .orderBy($"user_id")

  /** Ordered conversion FUNNEL (the product-analytics staple): per user,
    * the first `view`, the first `click` strictly after it, the first
    * `purchase` strictly after that — sequential conditional minima, the
    * deterministic relational funnel (no pattern-matching state machine
    * needed for first-occurrence semantics). Output: one row per user who
    * entered the funnel, stage timestamps (null once the chain breaks) and
    * the completed-stage count.
    *
    * Scale: three aggregations and two joins, ALL keyed on user_id — after
    * the first exchange the plan is co-partitioned end to end (the
    * [[userSessions]] argument); nothing is pairwise and no window spans
    * more than a user's own events. */
  def conversionFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"ts")
      .filter($"user_id".isNotNull)
    val s1 = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val s2 = e.filter($"event_type" === "click")
      .join(s1, "user_id").filter($"ts" > $"t1")
      .groupBy($"user_id").agg(min($"ts").as("t2"))
    val s3 = e.filter($"event_type" === "purchase")
      .join(s2, "user_id").filter($"ts" > $"t2")
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select($"user_id",
        date_format($"t1", "yyyy-MM-dd HH:mm:ss").as("view_ts"),
        date_format($"t2", "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        date_format($"t3", "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        (lit(1) + when($"t2".isNull, 0).otherwise(1)
          + when($"t3".isNull, 0).otherwise(1)).as("stages_completed"))
      .orderBy($"user_id")
  }

  /** Weekly COHORT RETENTION (the other product-analytics staple): users
    * cohorted by the ISO week of their first event; each (cohort,
    * week-offset) cell counts the cohort's users active that week. The
    * offset is exact integer epoch arithmetic — both week stamps are
    * `date_trunc('week')` values in a UTC-pinned session, so their
    * difference is an exact multiple of 604800 s and the division can't
    * straddle an engine boundary.
    *
    * Scale: first-event per user (one agg), distinct user-weeks (one
    * agg), one user-keyed join, cohort-keyed rollup — linear, and the
    * result is cohorts × weeks, dashboard-sized by construction. */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select($"user_id", $"ts").filter($"user_id".isNotNull)
    val firstWeek = e.groupBy($"user_id")
      .agg(date_trunc("week", min($"ts")).as("cohort"))
    val activeWeeks = e
      .select($"user_id", date_trunc("week", $"ts").as("wk")).distinct()
    activeWeeks.join(firstWeek, "user_id")
      .groupBy($"cohort",
        ((unix_timestamp($"wk") - unix_timestamp($"cohort")) / 604800L)
          .cast("long").as("week_offset"))
      .agg(count_distinct($"user_id").as("n_active"))
      .select(date_format($"cohort", "yyyy-MM-dd").as("cohort_week"),
        $"week_offset", $"n_active")
      .orderBy($"cohort_week", $"week_offset")
  }

  /** Top session PATHS: the ordered event-type sequence of each 30-minute
    * session, rolled up to the k most common paths — the navigation-
    * pattern table (onboarding analysis, bot signatures) that sits one
    * level above [[eventTransitions]]' pairwise view.
    *
    * Determinism: within a session, events order by (ts, event_id) — the
    * struct array_sort sees exactly those fields first — and the oracle's
    * string_agg uses the same ORDER BY. Top-k is count desc then path, a
    * TakeOrderedAndProject (never a global sort).
    *
    * Scale: sessionization is the standard single shuffle on user_id; the
    * per-session path agg re-keys (user_id, sid) with map-side partials;
    * the path rollup is paths-sized. Session paths are bounded by the
    * session gap, so collect_list here is per-session, not per-user.
    */
  def sessionPaths(spark: SparkSession, sfDir: String,
      gapMinutes: Int = 30, k: Int = 20): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val prev = lag($"ts", 1).over(w)
    val flag = when(prev.isNull ||
      unix_micros($"ts") - unix_micros(prev) > gapMinutes * 60000000L, 1L)
      .otherwise(0L)
    val sess = Tables.events(spark, sfDir)
      .filter($"user_id".isNotNull)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("sid", sum(flag).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val paths = sess.groupBy($"user_id", $"sid")
      .agg(array_join(
        transform(array_sort(collect_list(struct($"ts", $"event_id", $"event_type"))),
          x => x.getField("event_type")), ">").as("path"))
    paths.groupBy($"path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy($"n_sessions".desc, $"path")
      .limit(k)
  }

  /** First-order Markov transition matrix of per-user event sequences:
    * for each (event_type → next event_type) pair, the count and the
    * row-normalized probability — the behavioral fingerprint table
    * (anomaly detection, bot filtering, simulation seeding) every event
    * pipeline eventually wants.
    *
    * Scale: the lead() window partitions by user_id — each user's (small)
    * event list sorts within one task, the same single-shuffle shape as
    * sessionization; the transition rollup is type²-sized. Probability is
    * rounded to 6 decimals after each engine's own division. Ties on ts
    * are broken by event_id so both engines see the same sequence.
    */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = Tables.events(spark, sfDir)
      .filter($"user_id".isNotNull)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
    val counts = pairs.groupBy($"event_type", $"next_type")
      .agg(count(lit(1)).as("n"))
    val rowW = Window.partitionBy($"event_type")
    counts
      .withColumn("p",
        round($"n".cast("double") / sum($"n").over(rowW).cast("double"), 6))
      .orderBy($"event_type", $"next_type")
  }
}
