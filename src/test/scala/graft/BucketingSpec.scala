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

  test("band index append: union semantics, index side still exchange-free") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val batch = docs.filter($"doc_id" % 10 === 0)
    val corpusAll = docs.filter($"doc_id" % 10 =!= 0)
    val corpusA = corpusAll.filter($"doc_id" % 2 === 1)
    val corpusB = corpusAll.filter($"doc_id" % 2 === 0)
    Dedup.writeBandIndex(corpusA, "band_idx_append", buckets = 4)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // day one: probe against the initial index
      val probe1 = Dedup
        .incrementalNearDupIndexed(corpusA, "band_idx_append", batch)
        .as[(Long, Long, Double)].collect().toSet
      assert(probe1 == Dedup.incrementalNearDupOf(corpusA, batch)
        .as[(Long, Long, Double)].collect().toSet)
      // day two: append the next verified batch's bands, probe again —
      // union semantics (same rows as an in-plan run over the full corpus;
      // the cap never binds on the fixture, so no cap-drift here)
      // no explicit buckets: the append inherits the table's spec (4)
      Dedup.appendToBandIndex(corpusB, "band_idx_append")
      val got = Dedup
        .incrementalNearDupIndexed(corpusAll, "band_idx_append", batch)
        .as[(Long, Long, Double)].collect().toSet
      val expected = Dedup.incrementalNearDupOf(corpusAll, batch)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == expected)
      assert(got.nonEmpty)
      // and the appended table still reads co-located: no Exchange between
      // the (multi-file-per-bucket) index scan and the candidate join
      val bandJoin = Dedup.bandIndexCandidates("band_idx_append", batch)
        .queryExecution.executedPlan.collect {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
              if j.left.toString.contains("band_idx_append") ||
                j.right.toString.contains("band_idx_append") => j
        }.last
      val idxSide = if (bandJoin.left.toString.contains("band_idx_append"))
        bandJoin.left else bandJoin.right
      val shuffled = idxSide.collect { case e: ShuffleExchangeExec => e }
      assert(shuffled.isEmpty,
        s"appended band index was re-exchanged before the candidate join: $shuffled")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS band_idx_append")
    }
  }

  test("band index append: union cap drops a key that crosses maxBucketSize") {
    import spark.implicits._
    // 6 standing docs + 6 incoming docs share one long common text, so every
    // band key of that text holds 6 standing rows; with cap=8 the union
    // (12) crosses the cap and the incoming rows must be dropped, while a
    // distinct low-traffic key (the probe doc pair) stays appendable
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val standing = (1L to 6L).map(i => (i, common)).toDF("doc_id", "text")
    val incoming = (11L to 16L).map(i => (i, common)).toDF("doc_id", "text")
    val probeDoc = Seq((100L, common)).toDF("doc_id", "text")
    Dedup.writeBandIndex(standing, "band_idx_cap", buckets = 2,
      maxBucketSize = 8)
    try {
      Dedup.appendToBandIndex(incoming, "band_idx_cap", buckets = 2,
        maxBucketSize = 8)
      // the standing rows survive (<= cap at their own write); the incoming
      // rows were dropped by the union cap, so a probe matches only 1..6
      val matched = Dedup
        .incrementalNearDupIndexed(standing.union(incoming), "band_idx_cap",
          probeDoc)
        .as[(Long, Long, Double)].collect().toSet
      assert(matched.map(_._2) == (1L to 6L).toSet,
        s"expected only standing docs to match, got $matched")
    } finally spark.sql("DROP TABLE IF EXISTS band_idx_cap")
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
      // the build-once contract: the index side of the CANDIDATE join reads
      // in place — no Exchange between the index scan and the join (the
      // batch side and the downstream verify joins shuffle freely; those
      // move batch/candidate rows, not the index). The probe materializes
      // the candidate stage eagerly (localCheckpoint), so the plan property
      // is pinned on the exposed candidate frame itself.
      val bandJoin = Dedup.bandIndexCandidates("band_idx_test", batch)
        .queryExecution.executedPlan.collect {
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
      val probe = Dedup.incrementalNearDupIndexed(corpus, "band_idx_test", batch)
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

  test("band index rebuild: new geometry swaps under the serving name, probes survive") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batch = docs.filter($"doc_id" % 10 === 0)
    val loc = s"${graft.util.TmpDirs.perProcessDir("graft_rebuild_band")}/idx"
    Dedup.writeBandIndex(corpus, "band_idx_rebuild", buckets = 4,
      location = Some(loc))
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val before = Dedup
        .incrementalNearDupIndexed(corpus, "band_idx_rebuild", batch)
        .as[(Long, Long, Double)].collect().toSet
      assert(before.nonEmpty)
      // retune to a COARSER geometry (fewer, wider bands — lower fan-out,
      // stricter candidate recall) and swap it in under live probes
      Dedup.rebuildBandIndex(corpus, "band_idx_rebuild", numBands = 64,
        rowsPerBand = 16, buckets = 4)
      // the next probe (same serving name, no re-register) must agree with
      // a from-scratch in-plan run at the NEW geometry
      val after = Dedup
        .incrementalNearDupIndexed(corpus, "band_idx_rebuild", batch,
          numBands = 64, rowsPerBand = 16)
        .as[(Long, Long, Double)].collect().toSet
      val expected = Dedup
        .incrementalNearDupOf(corpus, batch, numBands = 64, rowsPerBand = 16)
        .as[(Long, Long, Double)].collect().toSet
      assert(after == expected)
      // the rebuilt table still reads co-located: zero Exchange between the
      // index scan and the candidate join, same as a fresh build
      val bandJoin = Dedup
        .bandIndexCandidates("band_idx_rebuild", batch, numBands = 64,
          rowsPerBand = 16)
        .queryExecution.executedPlan.collect {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
              if j.left.toString.contains("band_idx_rebuild") ||
                j.right.toString.contains("band_idx_rebuild") => j
        }.last
      val idxSide = if (bandJoin.left.toString.contains("band_idx_rebuild"))
        bandJoin.left else bandJoin.right
      val shuffled = idxSide.collect { case e: ShuffleExchangeExec => e }
      assert(shuffled.isEmpty,
        s"rebuilt band index re-exchanged before the candidate join: $shuffled")
      // a second rebuild ping-pongs the data location back — suffixes never
      // nest — and restores the original geometry's probe results exactly
      Dedup.rebuildBandIndex(corpus, "band_idx_rebuild", buckets = 4)
      val loc2 = spark.sessionState.catalog
        .getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier("band_idx_rebuild"))
        .location.toString
      assert(loc2.endsWith("_swapa") || loc2.endsWith("_swapb"))
      assert(!loc2.contains("_swapa_swap") && !loc2.contains("_swapb_swap"),
        s"rebuild locations must ping-pong, not nest: $loc2")
      val again = Dedup
        .incrementalNearDupIndexed(corpus, "band_idx_rebuild", batch)
        .as[(Long, Long, Double)].collect().toSet
      assert(again == before)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS band_idx_rebuild")
    }
  }

  test("hash index probe: persisted signature index side never shuffles") {
    import spark.implicits._
    val sigs = graft.multimodal.Media.imageAHash(
      graft.multimodal.Media.synthesizeImageVariants(spark, 100)).toDF()
    val corpus = sigs.filter($"media_id" < 150)
    val batch = sigs.filter($"media_id" >= 150)
    Dedup.writeHashIndex(corpus, "media_id", "ahash", "hash_idx_test",
      numChunks = 8, buckets = 4)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // same build-once contract as the band index: the index side of the
      // probe join reads in place — no Exchange between its scan and the
      // join; only the batch side moves
      val probePlan = Dedup.hammingIndexProbe("hash_idx_test", batch,
        "media_id", "ahash", numChunks = 8, maxHamming = 6)
        .queryExecution.executedPlan
      val join = probePlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.left.toString.contains("hash_idx_test") ||
              j.right.toString.contains("hash_idx_test") => j
      }.last
      val idxSide = if (join.left.toString.contains("hash_idx_test"))
        join.left else join.right
      val shuffled = idxSide.collect { case e: ShuffleExchangeExec => e }
      assert(shuffled.isEmpty,
        s"hash index was re-exchanged before the probe join: $shuffled")
      // layout is semantics-free: same pairs as the self-join restricted
      // to batch×corpus
      val got = Dedup.hammingIndexProbe("hash_idx_test", batch,
        "media_id", "ahash", numChunks = 8, maxHamming = 6)
        .as[(Long, Long, Int)].collect().toSet
      val all = Dedup.hammingNearDup(sigs, "media_id", "ahash",
        numChunks = 8, maxHamming = 6)
        .as[(Long, Long, Int)].collect()
      val expected = all.filter(p => p._1 < 150 && p._2 >= 150)
        .map(p => (p._2, p._1, p._3)).toSet
      assert(got == expected)
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS hash_idx_test")
    }
  }

  test("hash index probe/append fail loudly on a numChunks mismatch") {
    import spark.implicits._
    val sigs = graft.multimodal.Media.imageAHash(
      graft.multimodal.Media.synthesizeImageVariants(spark, 50)).toDF()
    Dedup.writeHashIndex(sigs, "media_id", "ahash", "hash_idx_geom",
      numChunks = 8, buckets = 4)
    try {
      // build records the geometry as a table property
      val props = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("hash_idx_geom"))
        .properties
      assert(props.get(Dedup.NumChunksProperty).contains("8"))
      // a probe at a different geometry would silently drop pairs (the
      // (chunk, key) layout shifts) — it must throw instead. numChunks=4
      // keeps the pigeonhole precondition valid so the GEOMETRY guard is
      // what fires.
      val probeEx = intercept[IllegalArgumentException] {
        Dedup.hammingIndexProbe("hash_idx_geom", sigs,
          "media_id", "ahash", numChunks = 4, maxHamming = 3)
      }
      assert(probeEx.getMessage.contains("numChunks=8"))
      val appendEx = intercept[IllegalArgumentException] {
        Dedup.appendToHashIndex(sigs, "media_id", "ahash",
          "hash_idx_geom", numChunks = 4)
      }
      assert(appendEx.getMessage.contains("numChunks=8"))
      // a legacy index without the property is checked from the data:
      // max(chunk)+1 of the standing table
      spark.sql("ALTER TABLE hash_idx_geom UNSET TBLPROPERTIES " +
        s"('${Dedup.NumChunksProperty}')")
      val legacyEx = intercept[IllegalArgumentException] {
        Dedup.hammingIndexProbe("hash_idx_geom", sigs,
          "media_id", "ahash", numChunks = 4, maxHamming = 3)
      }
      assert(legacyEx.getMessage.contains("numChunks=8"))
      // the matching geometry still probes fine either way
      assert(Dedup.hammingIndexProbe("hash_idx_geom", sigs,
        "media_id", "ahash", numChunks = 8, maxHamming = 6).count() >= 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS hash_idx_geom")
    }
  }

  test("embedding band index: post-append probe exchange-free with union semantics") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val corpusA = emb.filter($"vec_id" % 10 =!= 0 && $"vec_id" % 10 =!= 1)
    val corpusB = emb.filter($"vec_id" % 10 === 1)
    val batch = emb.filter($"vec_id" % 10 === 0)
    Dedup.writeEmbeddingBandIndex(corpusA, "emb_idx_bspec", buckets = 4)
    Dedup.appendToEmbeddingBandIndex(corpusB, "emb_idx_bspec")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the appended index still reads co-located: no Exchange between the
      // index scan and the candidate join
      val bandJoin = Dedup.embeddingBandIndexCandidates("emb_idx_bspec", batch)
        .queryExecution.executedPlan.collect {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
              if j.left.toString.contains("emb_idx_bspec") ||
                j.right.toString.contains("emb_idx_bspec") => j
        }.last
      val idxSide = if (bandJoin.left.toString.contains("emb_idx_bspec"))
        bandJoin.left else bandJoin.right
      val shuffled = idxSide.collect { case e: ShuffleExchangeExec => e }
      assert(shuffled.isEmpty,
        s"embedding index re-exchanged after append: $shuffled")
      // union semantics: the post-append probe equals a fresh build over
      // the union corpus
      val union = corpusA.union(corpusB)
      val got = Dedup.incrementalEmbeddingNearDupIndexed(
        union, "emb_idx_bspec", batch)
        .as[(Long, Long, Double)].collect().toSet
      Dedup.writeEmbeddingBandIndex(union, "emb_idx_bspec_fresh", buckets = 4)
      val expected = Dedup.incrementalEmbeddingNearDupIndexed(
        union, "emb_idx_bspec_fresh", batch)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == expected)
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS emb_idx_bspec")
      spark.sql("DROP TABLE IF EXISTS emb_idx_bspec_fresh")
    }
  }

  test("embedding band index rebuild: new LSH geometry swaps under the serving name") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    val batch = emb.filter($"vec_id" % 10 === 0)
    val loc = s"${graft.util.TmpDirs.perProcessDir("graft_rebuild_emb")}/idx"
    Dedup.writeEmbeddingBandIndex(corpus, "emb_idx_rebuild", buckets = 4,
      location = Some(loc))
    try {
      assert(Dedup.incrementalEmbeddingNearDupIndexed(
        corpus, "emb_idx_rebuild", batch)
        .as[(Long, Long, Double)].collect().nonEmpty)
      // retune: fewer, wider bands AND a new plane seed — a probe at the
      // matching geometry must equal one against a fresh same-geometry
      // build (the rebuild is a layout+geometry swap, not a semantic)
      Dedup.rebuildEmbeddingBandIndex(corpus, "emb_idx_rebuild",
        numBands = 32, rowsPerBand = 4, seed = 23L, buckets = 4)
      val got = Dedup.incrementalEmbeddingNearDupIndexed(
        corpus, "emb_idx_rebuild", batch, numBands = 32, rowsPerBand = 4,
        seed = 23L)
        .as[(Long, Long, Double)].collect().toSet
      Dedup.writeEmbeddingBandIndex(corpus, "emb_idx_rebuild_fresh",
        numBands = 32, rowsPerBand = 4, seed = 23L, buckets = 4)
      val expected = Dedup.incrementalEmbeddingNearDupIndexed(
        corpus, "emb_idx_rebuild_fresh", batch, numBands = 32,
        rowsPerBand = 4, seed = 23L)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == expected)
      assert(got.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS emb_idx_rebuild")
      spark.sql("DROP TABLE IF EXISTS emb_idx_rebuild_fresh")
    }
  }

  test("hash index rebuild: new chunk geometry swaps in and the property guard follows") {
    import spark.implicits._
    val sigs = graft.multimodal.Media.imageAHash(
      graft.multimodal.Media.synthesizeImageVariants(spark, 150)).toDF()
    val loc = s"${graft.util.TmpDirs.perProcessDir("graft_rebuild_hash")}/idx"
    Dedup.writeHashIndex(sigs, "media_id", "ahash", "hash_idx_rebuild",
      numChunks = 8, buckets = 4, location = Some(loc))
    try {
      // rebuild at a tighter pigeonhole budget (numChunks 8 → 4)
      Dedup.rebuildHashIndex(sigs, "media_id", "ahash", "hash_idx_rebuild",
        numChunks = 4, buckets = 4)
      val props = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("hash_idx_rebuild"))
        .properties
      assert(props.get(Dedup.NumChunksProperty).contains("4"),
        s"chunk-geometry property did not follow the rebuild: $props")
      // probes at the NEW geometry work; the OLD geometry fails loudly
      val got = Dedup.hammingIndexProbe("hash_idx_rebuild", sigs,
        "media_id", "ahash", numChunks = 4, maxHamming = 3)
        .as[(Long, Long, Int)].collect()
      assert(got.nonEmpty)
      val _ = intercept[IllegalArgumentException] {
        Dedup.hammingIndexProbe("hash_idx_rebuild", sigs,
          "media_id", "ahash", numChunks = 8, maxHamming = 6).count()
      }
    } finally spark.sql("DROP TABLE IF EXISTS hash_idx_rebuild")
  }
}
