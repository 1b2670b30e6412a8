package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols._

/** As-of join — for each left row, the single most recent right row with the
  * same key and a STRICTLY earlier timestamp (the temporal-join primitive
  * Spark has no built-in operator for; no reference-repo analogue — this is
  * a builder-brief extension).
  *
  * Implementation is the sort-merge union trick, composed entirely from
  * built-ins (the brief's preference (a) — no custom plan node needed):
  * tag both inputs, union them, and carry the last right-side payload
  * forward over a `(key) ORDER BY (time, side)` window. Left rows sort
  * before right rows at equal timestamps, so an equal-time right row is
  * never visible to that left row — exactly DuckDB's `ASOF JOIN ... ON
  * l.ts > r.ts` semantics, which the oracle uses verbatim.
  *
  * Scale design: ONE shuffle on the key for both inputs (the union is
  * shuffle-free; the window sorts per key partition, spillable by the
  * sort-based window exec). A naive `l JOIN r ON l.key = r.key AND l.ts >
  * r.ts` + max-rank is O(|matches|) intermediate rows — quadratic on hot
  * keys; the carry-forward form is strictly linear in |L|+|R| and immune
  * to temporal skew. Key skew mirrors any keyed shuffle (salt upstream if
  * one key dominates).
  */
object AsOf {

  /** Left-as-of-join `right` onto `left`.
    *
    * @param left      any frame containing `key` and `time`
    * @param right     frame with `key`, `time`, and the payload columns;
    *                  must be unique per (key, time) — pre-aggregate if not,
    *                  or the carried payload at equal times is tie-ambiguous
    * @param key       equi-join key column name (both sides)
    * @param time      event-time column name (both sides)
    * @param payload   right-side columns to carry (emitted null when no
    *                  strictly-earlier right row exists)
    * @param timeAlias name for the carried right-side timestamp column
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String, time: String,
      payload: Seq[String], timeAlias: String = "asof_time"): DataFrame = {
    val leftCols = left.columns
    // fail fast on name collisions — a duplicate output column would be
    // silently ambiguous for every downstream select
    val clashes = (payload :+ timeAlias).filter(leftCols.contains)
    require(clashes.isEmpty,
      s"as-of payload/timeAlias collide with left columns: ${clashes.mkString(", ")}")
    require(!leftCols.exists(_.startsWith("__")),
      "left columns may not start with __ (reserved for join internals)")
    val payloadStruct = struct(
      (col(time).as(timeAlias) +: payload.map(col)): _*)
    val lTagged = left
      .withColumn("__side", lit(0))
      .withColumn("__p", lit(null).cast(
        right.select(payloadStruct).schema.head.dataType))
    val rTagged = right
      // a NULL right timestamp would sort before everything in the window
      // and be carried as "earlier than any left row" — DuckDB's ASOF
      // strict bound matches it to nothing, which is the sane semantics
      .filter(col(time).isNotNull)
      .select(col(key), col(time), lit(1).as("__side"),
        payloadStruct.as("__p"))
    // left columns absent on the right ride as nulls through the union
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    val outCols: Seq[Column] =
      leftCols.map(col).toSeq :+ col(s"__asof.$timeAlias").as(timeAlias)
    carried.select((outCols ++ payload.map(p => col(s"__asof.$p").as(p))): _*)
  }

  /** Registered query: each event joined as-of to the same user's most
    * recent strictly-earlier purchase, with the elapsed whole seconds.
    * Purchases are canonicalized to one row per (user_id, ts) first (max
    * event_id) so the carried payload is deterministic under timestamp ties.
    */
  def lastPurchaseAsOf(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"ts")
    val purchases = events
      .filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("last_purchase_id"))
    joinAsOf(events, purchases, key = "user_id", time = "ts",
      payload = Seq("last_purchase_id"), timeAlias = "p_ts")
      .select($"event_id", $"user_id", $"event_type", $"last_purchase_id",
        // integer µs difference floor-divided to whole seconds: engine-exact
        // (double seconds would round differently across engines)
        expr("(unix_micros(ts) - unix_micros(p_ts)) div 1000000")
          .as("secs_since_purchase"))
  }
}
