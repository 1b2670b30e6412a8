package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
