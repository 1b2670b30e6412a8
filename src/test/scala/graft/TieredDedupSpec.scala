package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Tiered incremental dedup: exact-hash tier first, band tier for the
  * remainder ([[Dedup.tieredIncrementalNearDupIndexed]]). Pins the
  * first-tier-wins semantics, decision parity with the untiered probe, and
  * the co-located plan shape of the exact index.
  */
class TieredDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def recrawlBatch = {
    val docs = Tables.documents(spark, sf)
    docs.filter($"doc_id" % 10 === 0).select(
      ($"doc_id" + 1000000L).as("doc_id"),
      when($"doc_id" % 20 === 0,
        concat(coalesce($"text", lit("")), lit(" v2")))
        .otherwise($"text").as("text"))
  }

  test("tiered probe: first-tier-wins pairs, decision parity with untiered") {
    val docs = Tables.documents(spark, sf)
    val batch = recrawlBatch
    Dedup.writeBandIndex(docs, "tiered_band_idx", buckets = 4)
    Dedup.writeExactIndex(docs, "tiered_exact_idx", buckets = 4)
    try {
      val got = Dedup.tieredIncrementalNearDupIndexed(docs,
        "tiered_band_idx", "tiered_exact_idx", batch)
        .as[(Long, Long, Double)].collect().toSet

      // expected from first principles: text-equality pairs at 1.0, then
      // the untiered probe's pairs for docs with no exact twin
      val t = docs.select($"doc_id",
        coalesce($"text", lit("")).as("t")).filter(length($"t") >= 5)
      val bt = batch.select($"doc_id",
        coalesce($"text", lit("")).as("t")).filter(length($"t") >= 5)
      val exactExpected = bt.as("b").join(t.as("c"),
        col("b.t") === col("c.t"))
        .select(col("b.doc_id"), col("c.doc_id"))
        .as[(Long, Long)].collect().toSet
      assert(exactExpected.nonEmpty, "fixture must exercise the exact tier")
      val exactIds = exactExpected.map(_._1)
      val untiered = Dedup.incrementalNearDupOf(docs, batch)
        .as[(Long, Long, Double)].collect().toSet
      val expected = exactExpected.map { case (n, d) => (n, d, 1.0) } ++
        untiered.filterNot(p => exactIds.contains(p._1))
      assert(got == expected)

      // the near tier actually fired too (updated pages pair ~0.95)
      assert(got.exists(_._3 < 1.0), "fixture must exercise the band tier")

      // DECISION parity: the set of batch docs flagged as duplicates is
      // identical to the untiered probe's (an exact twin is itself a
      // jaccard-1.0 pair, so tiering can only narrow pair LISTS, never
      // change which docs are duplicates)
      assert(got.map(_._1) == untiered.map(_._1))
    } finally {
      spark.sql("DROP TABLE IF EXISTS tiered_band_idx")
      spark.sql("DROP TABLE IF EXISTS tiered_exact_idx")
    }
  }

  test("exact index probe: index side exchange-free, batch never broadcast") {
    val docs = Tables.documents(spark, sf)
    Dedup.writeExactIndex(docs, "tiered_exact_plan", buckets = 4)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // the tiered probe's exact stage (the full tiered frame checkpoints
      // eagerly, so the stage's plan is inspected via its own entry point)
      val plan = Dedup.exactIndexCandidates("tiered_exact_plan", recrawlBatch)
        .queryExecution.executedPlan
      val exactJoin = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.toString.contains("tiered_exact_plan") => j
      }
      assert(exactJoin.nonEmpty,
        "exact probe must be a sort-merge join (never a driver-side " +
          "broadcast of the batch — streaming sources estimate tiny)")
      val idx = exactJoin.map { j =>
        if (j.left.toString.contains("tiered_exact_plan")) j.left else j.right
      }
      // the standing index streams in place; only the batch side exchanges
      idx.foreach { side =>
        val shuffled = side.collect { case e: ShuffleExchangeExec => e }
        assert(shuffled.isEmpty,
          s"exact index re-exchanged before its probe join: $shuffled")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sql("DROP TABLE IF EXISTS tiered_exact_plan")
    }
  }

  test("exact index append: union semantics across days") {
    val docs = Tables.documents(spark, sf)
    val dayA = docs.filter($"doc_id" % 2 === 1)
    val dayB = docs.filter($"doc_id" % 2 === 0)
    Dedup.writeBandIndex(docs, "tiered_app_band", buckets = 4)
    Dedup.writeExactIndex(dayA, "tiered_app_exact", buckets = 4)
    try {
      Dedup.appendToExactIndex(dayB, "tiered_app_exact")
      val got = Dedup.tieredIncrementalNearDupIndexed(docs,
        "tiered_app_band", "tiered_app_exact", recrawlBatch)
        .as[(Long, Long, Double)].collect().toSet
      Dedup.writeExactIndex(docs, "tiered_app_exact2", buckets = 4)
      val fresh = Dedup.tieredIncrementalNearDupIndexed(docs,
        "tiered_app_band", "tiered_app_exact2", recrawlBatch)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == fresh)
      assert(got.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS tiered_app_band")
      spark.sql("DROP TABLE IF EXISTS tiered_app_exact")
      spark.sql("DROP TABLE IF EXISTS tiered_app_exact2")
    }
  }

  test("first-tier-wins: a doc with an exact twin reports only exact pairs") {
    // doc 100's text equals corpus doc 1 exactly AND is a near-dup of
    // corpus doc 2 — the tiered probe must report only (100, 1, 1.0)
    val base = "the quick brown fox jumps over the lazy dog in the morning"
    val corpus = Seq((1L, base), (2L, base + " x")).toDF("doc_id", "text")
    val batch = Seq((100L, base)).toDF("doc_id", "text")
    Dedup.writeBandIndex(corpus, "tiered_ftw_band", buckets = 2)
    Dedup.writeExactIndex(corpus, "tiered_ftw_exact", buckets = 2)
    try {
      val got = Dedup.tieredIncrementalNearDupIndexed(corpus,
        "tiered_ftw_band", "tiered_ftw_exact", batch)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == Set((100L, 1L, 1.0)))
      // while the untiered probe reports the near pair too
      val untiered = Dedup.incrementalNearDupOf(corpus, batch)
        .as[(Long, Long, Double)].collect().toSet
      assert(untiered.map(_._2) == Set(1L, 2L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS tiered_ftw_band")
      spark.sql("DROP TABLE IF EXISTS tiered_ftw_exact")
    }
  }
}
