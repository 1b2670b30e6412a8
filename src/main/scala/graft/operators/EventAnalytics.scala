package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Sessionless per-user rollup: activity span + volume per user. */
  def userActivity(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
        date_format(max($"ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        round(sum($"value"), 2).as("total_value"))
      .orderBy($"user_id")
}
