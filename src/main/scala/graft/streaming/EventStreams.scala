package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the batch event analytics
  * (SURVEY.md §2.6 T2; batch forms in [[graft.operators.EventAnalytics]]).
  *
  * Same column expressions and the same hash-aggregate shape as the batch
  * plans — one shuffle on the group keys, incremental state per window. The
  * watermark bounds state: windows older than (max event time − delay) are
  * finalized and evicted, so state size is O(active windows × types), not
  * O(stream length) — the property that keeps this runnable forever at
  * firehose rates.
  */
object EventStreams {

  /** Tumbling 1-hour event-time window counts per event type with late-data
    * handling — the streaming form of `EventAnalytics.hourlyTypeCounts`.
    * Late rows within `lateness` are merged into their window; older rows are
    * dropped when the watermark has passed (asserted by spec).
    */
  def hourlyTypeCounts(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup at the ingest edge: drop re-deliveries of the
    * same key (at-least-once sources re-send on retry) while bounding state
    * with the watermark — a key's dedup state is evicted once the watermark
    * passes its event time plus the allowance, so state is O(keys per
    * watermark window), not O(stream length). The batch twin is
    * [[graft.operators.Dedup.exactDedup]]'s canonical-keep; here arrival
    * order decides (first delivery wins), which is the streaming-native
    * semantics.
    */
  def dedupEvents(events: DataFrame, keyCol: String = "event_id",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Stream-static enrichment join — the third streaming-join mode next to
    * stream-stream ([[purchaseClickPairs]]) and the implicit self-derived
    * forms: a streaming frame joined to a BATCH dimension. No state, no
    * watermark needed — Structured Streaming re-plans the static side per
    * micro-batch, and when the dimension is broadcast-sized the join is a
    * stateless map-side broadcast hash join in every batch (dimension
    * updates between batches are picked up on re-read, the lakehouse
    * slowly-changing-dimension pattern).
    */
  def enrichEvents(events: DataFrame, dimension: DataFrame,
      on: String = "event_type"): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dimension), on)

  /** Watermarked stream-stream interval join: each purchase paired with the
    * same user's clicks in the preceding `windowSpec` (inclusive bounds) —
    * the streaming twin of the bucketed batch range join
    * ([[graft.operators.RangeJoin.purchaseClickAttribution]], which also
    * aggregates; here the raw pairs are emitted in append mode so no second
    * stateful operator is needed).
    *
    * State is bounded on BOTH sides by the watermark plus the join's
    * time-range condition: a buffered click can only match purchases with
    * p_ts ∈ [c_ts, c_ts + window], so once the watermark passes c_ts +
    * window + lateness the click's state row is evicted — the property that
    * keeps a forever-running attribution join at firehose rates in O(window)
    * state, not O(stream).
    */
  def purchaseClickPairs(clicks: DataFrame, purchases: DataFrame,
      windowSpec: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", lateness)
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val p = purchases.withWatermark("ts", lateness)
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    p.join(c,
      col("c_user") === col("p_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowSpec") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("click_id"), col("p_ts"), col("c_ts"))
  }

  /** One event of the sessionization input stream. */
  case class SessionEvent(user_id: Long, ts: Timestamp)

  /** A closed session — emitted once, in append mode. */
  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Per-user state between micro-batches: the still-open session.
    * Times in epoch MICROseconds — same precision as the batch twin's
    * unix_micros gap comparison (ms would mis-classify sub-ms gaps at the
    * boundary the same way whole-second truncation did, ADVICE r3).
    *
    * STATE COMPAT: the unit changed from ms to µs with an identical
    * Long/Long/Long shape, so Spark's checkpoint state-schema check cannot
    * catch a restart from a pre-change checkpoint — stored ms values would
    * be silently reread as µs. Restarting an old checkpoint on this build
    * is invalid; start the query fresh. */
  case class OpenSession(startUs: Long, lastUs: Long, n: Long)

  /** Gap-based sessionization, streaming form (SURVEY.md §2.6 T3 extension;
    * batch twin: [[graft.operators.EventAnalytics.userSessionsOf]]): custom
    * per-key state via `flatMapGroupsWithState`. A session closes when
    * `gapMinutes` pass with no event for that user — detected either by a
    * later event in a subsequent batch or by an event-time timeout once the
    * watermark passes (last event + gap).
    *
    * State per user is ONE OpenSession (24 bytes) regardless of stream
    * length, and timed-out keys are removed — bounded state is what lets this
    * run forever. Late events behind the watermark are dropped by the
    * pre-aggregation watermark filter; events late-but-within-allowance merge
    * into the open session or (if older than it) extend it backwards.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
      lateness: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L

    // Spark's own converters: exact for sub-second values on BOTH sides of
    // the 1970 epoch (hand-rolled /1000 arithmetic truncates toward zero,
    // which mis-converts pre-1970 times and can feed setNanos a negative)
    def toMicros(ts: Timestamp): Long =
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(ts)

    def fromMicros(us: Long): Timestamp =
      org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(us)

    def close(s: OpenSession, userId: Long): Session =
      Session(userId, fromMicros(s.startUs), fromMicros(s.lastUs), s.n)

    events
      .withWatermark("ts", lateness)
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, batch, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(_, userId)).toList
            state.remove()
            out.iterator
          } else {
            val times = batch.map(e => toMicros(e.ts)).toArray.sorted
            var open = state.getOption.orNull
            val closed = List.newBuilder[Session]
            times.foreach { t =>
              open match {
                case null => open = OpenSession(t, t, 1)
                case o if t - o.lastUs <= gapUs =>
                  open = OpenSession(math.min(o.startUs, t), math.max(o.lastUs, t), o.n + 1)
                case o =>
                  closed += close(o, userId)
                  open = OpenSession(t, t, 1)
              }
            }
            state.update(open)
            // fires once the watermark passes the would-be session end
            // (timeout API is ms — round UP so the timeout never fires a
            // fraction early and splits a would-be-merged session)
            state.setTimeoutTimestamp((open.lastUs + gapUs + 999) / 1000)
            closed.result().iterator
          }
      }
  }
}
