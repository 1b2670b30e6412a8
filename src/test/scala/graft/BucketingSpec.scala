package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Bucketed co-located joins: persisting both sides bucketed on the join key
  * removes the shuffle from every subsequent join on that key — the
  * pay-once scale path for recurring fact⋈fact joins.
  */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("join between same-key bucketed tables plans with zero shuffles") {
    Tables.writeBucketed(
      Tables.lineitem(spark, sf).select($"l_orderkey", $"l_extendedprice"),
      "li_bucketed", "l_orderkey", 8)
    Tables.writeBucketed(
      Tables.orders(spark, sf).select($"o_orderkey", $"o_orderpriority"),
      "ord_bucketed", "o_orderkey", 8)

    // pin the plan: no AQE re-writes, no broadcast of the small side — the
    // point under test is the shuffle-free sort-merge join bucketing enables
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(round(sum($"l_extendedprice"), 2).as("rev"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // one shuffle remains for the 5-group aggregate; the JOIN itself is
      // exchange-free (both sides read pre-bucketed)
      assert(shuffles.size == 1, s"expected only the agg shuffle, got: $shuffles")

      // and it computes the same thing as the straight join
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(round(sum($"l_extendedprice"), 2).as("rev"))
        .as[(String, Double)].collect().toMap
      val got = joined.as[(String, Double)].collect().toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("incremental dedup probe: persisted band index side never shuffles") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batch = docs.filter($"doc_id" % 10 === 0)
    Dedup.writeBandIndex(corpus, "band_idx_test", buckets = 4)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = Dedup.incrementalNearDupIndexed(corpus, "band_idx_test", batch)
      // the build-once contract: the index side of the CANDIDATE join reads
      // in place — no Exchange between the index scan and the join (the
      // batch side and the downstream verify joins shuffle freely; those
      // move batch/candidate rows, not the index). Find the innermost join
      // whose subtree reads the index (pre-order collect → last = innermost)
      // and assert its index-side child is exchange-free.
      val bandJoin = probe.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.left.toString.contains("band_idx_test") ||
              j.right.toString.contains("band_idx_test") => j
      }.last
      val idxSide = if (bandJoin.left.toString.contains("band_idx_test"))
        bandJoin.left else bandJoin.right
      val shuffled = idxSide.collect { case e: ShuffleExchangeExec => e }
      assert(shuffled.isEmpty,
        s"band index was re-exchanged before the candidate join: $shuffled")
      // and the layout change is semantics-free: same rows as the in-plan path
      val got = probe.as[(Long, Long, Double)].collect().toSet
      val expected = Dedup.incrementalNearDupOf(corpus, batch)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == expected)
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS band_idx_test")
    }
  }
}
