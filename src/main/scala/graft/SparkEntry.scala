package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{EventAnalytics, Reference, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a deterministic DataFrame plan over the
  * driver fixture tables; entries with a DuckDB-expressible equivalent have a
  * matching [[oracleSql]] row (same column names, same ORDER BY) for the
  * hash-compare gate. Non-SQL-expressible ops (LSH, KMeans, ...) appear in
  * [[queries]] only → rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Reference.groupByTextCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // —— reference parity (SURVEY.md §2.2-2.5) ——
    "scan_count" -> (Reference.scanCount _),
    "groupby_text_count" -> (Reference.groupByTextCount _),
    "select_text_notnull_limit" -> (Reference.selectTextNotNullLimit _),
    "lang_filter_fr" -> (Reference.langFilterFr _),
    "sanitize_projection" -> (Reference.sanitizeProjection _),
    "timestamp_format" -> (Reference.timestampFormat _),
    "encode_pipe_line" -> (Reference.encodePipeLine _),
    // —— relational core / bench headliners ——
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q3_top_revenue" -> (Relational.q3TopRevenue _),
    "q5_nation_revenue" -> (Relational.q5NationRevenue _),
    "top_orders_per_priority" -> (Relational.topOrdersPerPriority _),
    "distinct_parts" -> (Relational.distinctParts _),
    "customers_without_orders" -> (Relational.customersWithoutOrders _),
    // —— event analytics (streaming twins in graft.streaming) ——
    "events_hourly" -> (EventAnalytics.hourlyTypeCounts _),
    "json_props_agg" -> (EventAnalytics.jsonPropsAgg _),
    "user_activity" -> (EventAnalytics.userActivity _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "scan_count" ->
      "SELECT count(*) AS n_rows FROM documents",
    "groupby_text_count" ->
      "SELECT text, count(*) AS n FROM documents GROUP BY text",
    "select_text_notnull_limit" ->
      "SELECT doc_id, text FROM documents WHERE text IS NOT NULL ORDER BY doc_id LIMIT 5",
    "lang_filter_fr" ->
      "SELECT doc_id, text, lang FROM documents WHERE starts_with(coalesce(lang, ''), 'fr')",
    "sanitize_projection" ->
      ("SELECT doc_id, regexp_replace(replace(replace(translate(coalesce(text, ''), chr(9) || '\"', ''), " +
        "'[' || chr(13) || chr(10) || ']', ''), ',', ''''), '[\\p{C}]', '', 'g') AS text_clean FROM documents"),
    "timestamp_format" ->
      "SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') || '.0' AS created_at_text FROM events ORDER BY event_id LIMIT 1000",
    "encode_pipe_line" ->
      ("SELECT doc_id, regexp_replace(replace(replace(translate(coalesce(text, ''), chr(9) || '\"', ''), " +
        "'[' || chr(13) || chr(10) || ']', ''), ',', ''''), '[\\p{C}]', '', 'g') || '|' || coalesce(lang, '') || '|' || coalesce(source, '') AS line " +
        "FROM documents"),
    "q1_pricing_summary" ->
      ("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, " +
        "round(sum(l_extendedprice), 2) AS sum_base_price, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, " +
        "round(avg(l_quantity), 4) AS avg_qty, round(avg(l_discount), 4) AS avg_disc, " +
        "count(*) AS count_order FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "q3_top_revenue" ->
      ("SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey " +
        "WHERE c_mktsegment = 'BUILDING' GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10"),
    "q5_nation_revenue" ->
      ("SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, count(*) AS n_items " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY n_name ORDER BY n_name"),
    "top_orders_per_priority" ->
      ("SELECT o_orderpriority, o_orderkey, o_totalprice, rk FROM (" +
        "SELECT o_orderpriority, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rk " +
        "FROM orders) t WHERE rk <= 3 ORDER BY o_orderpriority, rk"),
    "distinct_parts" ->
      ("SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "customers_without_orders" ->
      ("SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) ORDER BY c_custkey"),
    "events_hourly" ->
      ("SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start, event_type, " +
        "count(*) AS n, round(sum(value), 2) AS sum_value FROM events " +
        "GROUP BY 1, 2 ORDER BY hour_start, event_type"),
    "json_props_agg" ->
      ("SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
        "count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k, " +
        "max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "user_activity" ->
      ("SELECT user_id, count(*) AS n_events, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts, " +
        "strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts, round(sum(value), 2) AS total_value " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
  )
}
