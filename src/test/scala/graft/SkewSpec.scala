package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Tables

/** Skew mitigation is a pure plan rewrite: salted results must be
  * BIT-EQUAL to the plain forms, and the salt must actually spread a hot
  * key across buckets (else the rewrite is dead weight).
  */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals the plain join") {
    val salted = Skew.skewSaltedJoin(spark, sf)
    val orders = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val cust = Tables.customer(spark, sf)
      .select($"c_custkey".as("o_custkey"), $"c_mktsegment", $"c_nationkey")
    val plain = orders.join(cust, "o_custkey")
      .select($"o_orderkey", $"o_custkey", $"c_mktsegment", $"c_nationkey",
        $"o_totalprice")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join: every fact row survives exactly once (no fan-out loss)") {
    val n = Skew.skewSaltedJoin(spark, sf)
      .groupBy($"o_orderkey").count().filter($"count" =!= 1).count()
    assert(n == 0)
  }

  test("salted distinct equals the plain count-distinct") {
    val salted = Skew.saltedDistinctUsers(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("the salt spreads a hot key across all buckets") {
    // one key owning every row — the shape AQE's stats see too late in a
    // streaming aggregate; the deterministic salt must hit all 8 buckets
    val hot = (0L until 4000L).map(i => ("hotkey", i)).toDF("k", "id")
    val buckets = hot
      .withColumn("salt", Skew.saltOf($"id", 8))
      .select($"salt").distinct().count()
    assert(buckets == 8)
  }

  test("salted distinct stays exact when a member repeats across rows") {
    // member-salting puts every copy of a member in ONE (key, salt) cell
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 1L), ("b", 1L))
      .toDF("event_type", "user_id")
    val got = Skew.saltedDistinct(df, "event_type", "user_id", salts = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }
}
