package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols._

/** Relational core over the TPC-H-ish star schema — the batch-SQL capability
  * surface (SURVEY.md §3.2) exercised at bench scale.
  *
  * Scale notes (these hold at 100 TB, not just sf0.1):
  *  - Dimension tables (region/nation/supplier/customer/part) are orders of
  *    magnitude smaller than the facts → always `broadcast()` them so fact
  *    tables never shuffle for those joins.
  *  - Aggregations run as partial+final HashAggregate (map-side combine) —
  *    the shuffle carries one row per group per task.
  *  - Double-typed SUM/AVG results are rounded in BOTH engines so the oracle
  *    hash is insensitive to summation order (parallel sums are not
  *    associative in IEEE754; at 1000 executors the order is arbitrary).
  */
object Relational {

  /** TPC-H Q1-style pricing summary: full-scan aggregate with selective
    * predicate pushed to parquet. */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")

  /** TPC-H Q3-style: top revenue orders for one market segment.
    * The filtered customer key set is NOT force-broadcast: one market
    * segment is still ~1/5 of all customers — tens of GB at 100 TB scale.
    * AQE broadcasts it at small SF (runtime size under the threshold) and
    * degrades gracefully to a shuffle join at scale, same policy as
    * [[q5NationRevenue]]. orders⋈lineitem shuffles once, on the join key
    * both sides already need. */
  def q3TopRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderkey")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  /** TPC-H Q5-style: revenue by nation through a 4-way dimension chain.
    * nation⋈region is explicitly broadcast — bounded by geography, small at
    * ANY scale factor. customer is NOT force-broadcast: at sf0.1 AQE turns
    * the join into a broadcast anyway (runtime size under the threshold),
    * while at 100 TB — where customer is tens of GB — the same plan degrades
    * gracefully to a shuffle join instead of OOMing the driver. Hint what is
    * small by construction; let AQE decide what is small by circumstance. */
  def q5NationRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val geo = Tables.nation(spark, sfDir).select($"n_nationkey", $"n_name", $"n_regionkey")
      .join(broadcast(Tables.region(spark, sfDir).select($"r_regionkey", $"r_name")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val dims = Tables.customer(spark, sfDir).select($"c_custkey", $"c_nationkey")
      .join(broadcast(geo), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name")
    val ord = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(dims, $"o_custkey" === $"c_custkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"n_name")
  }

  /** Window top-k: 3 highest-value orders per order priority, two-phase.
    * o_orderpriority has only 5 distinct values — a single
    * `Window.partitionBy(priority)` would sort the whole table on 5 tasks
    * (skew by construction; the round-2 verdict's flag). Phase 1 ranks within
    * (priority, salt) — 5×32 evenly-sized partitions — and prunes each to 3;
    * phase 2 ranks the ≤ 5×32×3 survivors. Identical result, no hot task. */
  def topOrdersPerPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val salts = 32
    val localW = Window.partitionBy($"o_orderpriority", pmod($"o_orderkey", lit(salts)))
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val globalW = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, sfDir)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
      .withColumn("lrk", row_number().over(localW))
      .filter($"lrk" <= 3)
      // cast to long: DuckDB row_number() yields BIGINT, and the oracle
      // compares schemas as well as values
      .withColumn("rk", row_number().over(globalW).cast("long"))
      .filter($"rk" <= 3)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice", $"rk")
      .orderBy($"o_orderpriority", $"rk")
  }

  /** Exact distinct counts per return flag (expand-based distinct agg). */
  def distinctParts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"))
      .orderBy($"l_returnflag")

  /** The distinct-count SCALE path: HyperLogLog++ sketches — fixed-size
    * mergeable state per group versus the exact form's expand (which
    * multiplies shuffled rows by the number of distinct aggregates).
    * Registered rows-only (the sketch is engine-specific); the spec bounds
    * its error against [[distinctParts]], the exact anchor. `rsd` 0.02 →
    * ~2% relative standard deviation. */
  def distinctPartsApprox(spark: SparkSession, sfDir: String,
      rsd: Double = 0.02): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", rsd).as("n_parts"),
        approx_count_distinct($"l_suppkey", rsd).as("n_supps"))
      .orderBy($"l_returnflag")

  /** HASH-CHECKED error envelope for the sketch tier: per group, the exact
    * distinct counts plus booleans asserting the HLL estimates land within
    * `tol` (5σ at rsd 0.02, plus one unit of slack for tiny groups). The
    * sketch value itself is engine-specific and can't be oracled, but the
    * CLAIM "approx within ε of exact" can: DuckDB replays the exact side
    * and literal TRUEs, so a sketch drifting out of its band flips a
    * boolean and turns the entry red — no more trust-the-spec for the
    * approximate family. Both sides are group-sized aggregates of one scan
    * each; the join is a broadcast over a handful of rows.
    */
  def distinctPartsEnvelope(spark: SparkSession, sfDir: String,
      tol: Double = 0.1): DataFrame = {
    val exact = distinctParts(spark, sfDir)
    val approx = distinctPartsApprox(spark, sfDir)
      .withColumnRenamed("n_parts", "ap_parts")
      .withColumnRenamed("n_supps", "ap_supps")
    exact.join(broadcast(approx), "l_returnflag")
      .select($"l_returnflag", $"n_parts", $"n_supps",
        (abs($"ap_parts" - $"n_parts") <= lit(tol) * $"n_parts" + 1)
          .as("parts_within_tol"),
        (abs($"ap_supps" - $"n_supps") <= lit(tol) * $"n_supps" + 1)
          .as("supps_within_tol"))
      .orderBy($"l_returnflag")
  }

  /** Correlated scalar subquery — orders priced above 1.5× their OWN
    * customer's average order value. Exercises Catalyst's subquery
    * decorrelation: the correlated aggregates rewrite to one grouped
    * aggregate over orders joined back on o_custkey (verify in PLANS.md —
    * no per-row subquery execution survives).
    *
    * Cross-engine exactness: the boundary predicate is kept in INTEGER
    * cents — `2·cents·count > 3·sum_cents` instead of `price > 1.5·avg` —
    * because double summation order differs per engine and a borderline
    * row could otherwise flip inclusion. Entered through `spark.sql`, the
    * library's SQL surface.
    */
  def ordersAboveCustAvg(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    spark.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders o
      WHERE 2 * CAST(round(o_totalprice * 100) AS BIGINT) *
              (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
            > 3 * (SELECT sum(CAST(round(o3.o_totalprice * 100) AS BIGINT))
                   FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
    """)
  }

  /** RANGE-frame window: each order's trailing-30-day spend for its
    * customer — the frame is bounded by the ORDER-BY VALUE (epoch seconds),
    * not row counts, so ties and gaps are handled by time, which is what a
    * rolling metric means. One shuffle on the customer key; the sort-based
    * window exec spills per partition. Sum kept in integer cents, divided
    * at the end — double accumulation order differs per engine. */
  def rollingCustomerSpend(spark: SparkSession, sfDir: String): DataFrame = {
    // o_orderdate is TIMESTAMP_NTZ; cast interprets it in the session TZ
    // (pinned UTC), matching DuckDB's naive epoch()
    val w = Window.partitionBy($"o_custkey")
      .orderBy(unix_seconds($"o_orderdate".cast("timestamp")))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .withColumn("spend_30d",
        round(sum($"cents").over(w).cast("double") / 100 + 1e-9, 2))
      .select($"o_orderkey", $"o_custkey", $"spend_30d")
  }

  /** Set operation (INTERSECT): customers active in both halves of the
    * order history — plans as a distinct + semi-join-shaped aggregate on
    * the intersect keys, one shuffle each side. */
  def repeatCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .select($"o_custkey", year($"o_orderdate").as("y"))
    val median = 1998 // fixture orders span 1995-2001; fixed split keeps the query deterministic
    ord.filter($"y" < median).select($"o_custkey")
      .intersect(ord.filter($"y" >= median).select($"o_custkey"))
      .orderBy($"o_custkey")
  }

  /** Pivot: per-user event counts, one column per event type. The pivot
    * values are DECLARED (not discovered with an extra pass) — at scale an
    * undeclared pivot first scans the corpus just to enumerate columns.
    * Null cells (user never produced the type) are filled to 0 so the
    * frame is dense. */
  def userTypePivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy($"user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"user_id")

  /** Semi/anti join: customers with vs without any order. Broadcast the
    * distinct key set when it fits; Catalyst/AQE picks the side. */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir).select($"o_custkey")
    Tables.customer(spark, sfDir)
      .join(ord, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }
}
