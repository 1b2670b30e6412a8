package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{coalesce, concat, lit, when}

import graft.operators.Dedup
import graft.sources.Tables
import graft.streaming.DedupStream

/** Streaming twin of incremental dedup: micro-batches probing the persisted
  * band index must agree with the batch [[Dedup.incrementalNearDupIndexed]]
  * on the same data, and the probe-then-append loop must surface
  * cross-batch duplicates.
  */
class DedupStreamSpec extends SparkTestBase {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("micro-batch probes equal the batch probe on the same data") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batchDocs = docs.filter($"doc_id" % 10 === 0)
    Dedup.writeBandIndex(corpus, "band_idx_ds", buckets = 4)
    val results = scala.collection.mutable.Set[(Long, Long, Double)]()
    val ms = MemoryStream[(Long, String)]
    val q = DedupStream.incrementalDedupQuery(
      ms.toDF().toDF("doc_id", "text"), corpus, "band_idx_ds") { (pairs, _) =>
      results ++= pairs.as[(Long, Long, Double)].collect()
    }.start()
    try {
      // the same incoming docs the batch entry probes, split across two
      // micro-batches — per-batch probes must union to the batch result
      val rows = batchDocs.select($"doc_id", $"text")
        .as[(Long, String)].collect()
      val (first, second) = rows.splitAt(rows.length / 2)
      ms.addData(first.toSeq: _*)
      q.processAllAvailable()
      ms.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS band_idx_ds")
    }
    val expected = Dedup.incrementalNearDupOf(corpus, batchDocs)
      .as[(Long, Long, Double)].collect().toSet
    assert(results.toSet == expected)
    assert(results.nonEmpty)
  }

  test("cross-batch retraction: a doc deleted mid-stream stops pairing at the next trigger; absorption preserves the probe and retires the medium") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batchDocs = docs.filter($"doc_id" % 10 === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    // the retractable doc: one batch doc's exact text under a junk id —
    // it pairs with that doc at jaccard 1.0 until the takedown lands
    val probeText = batchDocs.head._2
    val junkId = 7777777L
    val corpusPlus = corpus.select($"doc_id", $"text")
      .unionByName(Seq((junkId, probeText)).toDF("doc_id", "text"))
    Dedup.writeBandIndex(corpusPlus, "band_idx_retract", buckets = 4)
    val perBatch =
      scala.collection.mutable.Map[Long, Set[(Long, Long, Double)]]()
    val ms = MemoryStream[(Long, String)]
    val q = DedupStream.incrementalDedupQuery(
      ms.toDF().toDF("doc_id", "text"), corpusPlus, "band_idx_retract") {
      (pairs, bid) =>
        perBatch(bid) = pairs.as[(Long, Long, Double)].collect().toSet
    }.start()
    try {
      // trigger 1: the junk doc is standing — it must pair
      ms.addData((batchDocs.head._1, probeText))
      q.processAllAvailable()
      assert(perBatch(0L).exists(_._2 == junkId),
        "fixture degenerate: the retractable doc never paired")
      // the takedown: one tombstone append, no index rewrite
      Dedup.deleteFromIndexTable(spark, "band_idx_retract",
        Seq(Tuple1(junkId)).toDF("doc_id"))
      // trigger 2: same text — the junk id must be gone, real dups remain
      ms.addData((batchDocs.head._1 + 5000000L, probeText))
      q.processAllAvailable()
      assert(!perBatch(1L).exists(_._2 == junkId),
        "a deleted doc kept pairing from the standing index")
      assert(perBatch(1L).map(_._2) ==
        perBatch(0L).map(_._2) - junkId,
        "the fold must remove ONLY the retracted id")
      // absorption: the compaction rewrite drops the rows and retires the
      // medium; the next trigger's probe is unchanged
      Dedup.compactIndexTable(spark, "band_idx_retract")
      assert(!graft.util.Tombstones.exists(spark,
        Dedup.indexTombstoneRoot(spark, "band_idx_retract")))
      ms.addData((batchDocs.head._1 + 6000000L, probeText))
      q.processAllAvailable()
      assert(perBatch(2L).map(_._2) == perBatch(1L).map(_._2))
      assert(!perBatch(2L).exists(_._2 == junkId))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS band_idx_retract")
    }
  }

  test("streaming decontamination sweeps equal the batch sweep; benchmark prepared once") {
    import graft.operators.Decontamination
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val bench = docs.filter($"doc_id" % 10 === 0)
    val prepared = Decontamination.prepareBenchmark(bench)
    val results = scala.collection.mutable.Set[(Long, Long, Long)]()
    val ms = MemoryStream[(Long, String)]
    val q = DedupStream.decontaminationQuery(
      ms.toDF().toDF("doc_id", "text"), prepared) { (pairs, _) =>
      results ++= pairs.as[(Long, Long, Long)].collect()
    }.start()
    try {
      val rows = corpus.select($"doc_id", $"text").as[(Long, String)].collect()
      val (first, second) = rows.splitAt(rows.length / 2)
      ms.addData(first.toSeq: _*)
      q.processAllAvailable()
      ms.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      prepared.unpersist()
    }
    // a doc's pairs depend only on its own grams vs the frozen benchmark,
    // so micro-batch sweeps union to exactly the one-shot batch sweep
    val expected = Decontamination.contaminationPairsOf(corpus, bench)
      .as[(Long, Long, Long)].collect().toSet
    assert(results.toSet == expected)
    assert(results.nonEmpty)
  }

  test("ingest with a prepared benchmark: byte-equal survivors to the per-batch sweep form") {
    import graft.operators.Decontamination
    val docs = Tables.documents(spark, sf)
    val standing = docs.filter($"doc_id" % 10 =!= 0 && $"doc_id" % 10 =!= 1)
    val benchmark = docs.filter($"doc_id" % 10 === 0)
    val prepared = Decontamination.prepareBenchmark(benchmark)
    Dedup.writeBandIndex(standing, "band_idx_prepb", buckets = 4)
    val survivors = scala.collection.mutable.Set[(Long, String)]()
    val ms = MemoryStream[(Long, String, String)]
    val q = DedupStream.ingestQuery(
      ms.toDF().toDF("doc_id", "text", "lang"), docs, "band_idx_prepb",
      benchmark, preparedBench = Some(prepared)) { (clean, _) =>
      survivors ++= clean.select($"doc_id", $"lang").as[(Long, String)].collect()
    }.start()
    try {
      val rows = docs.filter($"doc_id" % 10 === 1)
        .select($"doc_id", $"text", $"lang")
        .orderBy($"doc_id").as[(Long, String, String)].collect()
      val (first, second) = rows.splitAt(rows.length / 2)
      ms.addData(first.toSeq: _*)
      q.processAllAvailable()
      ms.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      prepared.unpersist()
      spark.sql("DROP TABLE IF EXISTS band_idx_prepb")
    }
    // same survivors as the batch chain (and thus as the unprepared form,
    // pinned by the ingest-parity test above against the same oracle)
    val expected = graft.operators.Pipelines.ingestedCorpus(spark, sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSet
    assert(survivors.toSet == expected)
    assert(survivors.nonEmpty)
  }

  test("streaming ingest pipeline matches the batch ingest chain") {
    val docs = Tables.documents(spark, sf)
    val standing = docs.filter($"doc_id" % 10 =!= 0 && $"doc_id" % 10 =!= 1)
    val benchmark = docs.filter($"doc_id" % 10 === 0)
    Dedup.writeBandIndex(standing, "band_idx_ingest", buckets = 4)
    val survivors = scala.collection.mutable.Set[(Long, String)]()
    val ms = MemoryStream[(Long, String, String)]
    val q = DedupStream.ingestQuery(
      ms.toDF().toDF("doc_id", "text", "lang"),
      docs, // verify-side text lookup must cover standing + appended docs
      "band_idx_ingest", benchmark) { (clean, _) => // buckets inherit from the table
      survivors ++= clean.select($"doc_id", $"lang").as[(Long, String)].collect()
    }.start()
    try {
      // today's docs arrive in doc_id order over two micro-batches — the
      // order under which streaming first-arrival-wins coincides with the
      // batch chain's minimum-doc_id-wins
      val rows = docs.filter($"doc_id" % 10 === 1)
        .select($"doc_id", $"text", $"lang")
        .orderBy($"doc_id").as[(Long, String, String)].collect()
      val (first, second) = rows.splitAt(rows.length / 2)
      ms.addData(first.toSeq: _*)
      q.processAllAvailable()
      ms.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS band_idx_ingest")
    }
    val expected = graft.operators.Pipelines.ingestedCorpus(spark, sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSet
    assert(survivors.toSet == expected)
    assert(survivors.nonEmpty)
  }

  test("streaming ingest with quality gate + redaction matches the batch release chain") {
    import org.apache.spark.sql.functions.{lit, regexp_extract_all, size}
    val docs = graft.operators.Pii.plantedDocs(spark, sf)
      .toDF("doc_id", "text") // planted PII so redaction has work to do
    val standing = docs.filter($"doc_id" % 10 =!= 0 && $"doc_id" % 10 =!= 1)
    val benchmark = docs.filter($"doc_id" % 10 === 0)
    Dedup.writeBandIndex(standing, "band_idx_rel", buckets = 4)
    val got = scala.collection.mutable.Map[Long, String]()
    val ms = MemoryStream[(Long, String)]
    val q = DedupStream.ingestQuery(
      ms.toDF().toDF("doc_id", "text"), docs, "band_idx_rel", benchmark,
      minQuality = 0.45, redactPii = true) { (out, _) =>
      got ++= out.select($"doc_id", $"text").as[(Long, String)].collect()
    }.start()
    try {
      val rows = docs.filter($"doc_id" % 10 === 1)
        .orderBy($"doc_id").as[(Long, String)].collect()
      ms.addData(rows.toSeq: _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS band_idx_rel")
    }
    // batch-side replay of the same chain: ingest survivors ∩ quality gate
    val batchIngest = {
      val keep = Dedup.exactDedupOf(docs.filter($"doc_id" % 10 === 1))
        .select($"keep_doc_id".as("doc_id"))
      val inBatch = Dedup.nearDupPairsOf(docs.filter($"doc_id" % 10 === 1))
        .select($"b_doc_id".as("doc_id")).distinct()
      val vsStanding = Dedup.incrementalNearDupOf(
        standing, docs.filter($"doc_id" % 10 === 1))
        .select($"new_doc_id".as("doc_id")).distinct()
      val contaminated = graft.operators.Decontamination
        .contaminationPairsOf(docs.filter($"doc_id" % 10 === 1), benchmark)
        .select($"doc_id").distinct()
      val quality = graft.operators.TextAnalysis
        .textStatsOf(docs.filter($"doc_id" % 10 === 1))
        .filter($"quality_score" >= 0.45).select($"doc_id")
      docs.filter($"doc_id" % 10 === 1)
        .join(keep, "doc_id")
        .join(inBatch, Seq("doc_id"), "left_anti")
        .join(vsStanding, Seq("doc_id"), "left_anti")
        .join(contaminated, Seq("doc_id"), "left_anti")
        .join(quality, "doc_id")
    }
    val expectedIds = batchIngest.select($"doc_id").as[Long].collect().toSet
    assert(got.keySet == expectedIds)
    assert(got.nonEmpty)
    // sink text is fully scrubbed
    val survivors = got.toSeq.toDF("doc_id", "text")
    val leftovers = survivors.select(
      (size(regexp_extract_all($"text", lit(graft.operators.Pii.EmailRe), lit(0))) +
        size(regexp_extract_all($"text", lit(graft.operators.Pii.PhoneRe), lit(0))) +
        size(regexp_extract_all($"text", lit(graft.operators.Pii.IpRe), lit(0)))))
      .as[Int].collect()
    assert(leftovers.forall(_ == 0))
    // and redaction genuinely fired for at least one survivor
    assert(got.values.exists(_.contains("<EMAIL>")))
  }

  test("streaming ingest with span trim matches the batch trim chain and de-flags trimmed contamination") {
    // ten-token boilerplate shared by docs 1 and 3 (2+ in-batch occurrences
    // → a duplicated span) and ALSO the benchmark item's text: without the
    // trim both docs would be dropped as contaminated; with the trim the
    // sweep runs over the text that ships, the offending span is already
    // gone, and both survive trimmed. Pins the chain ORDER, not just the
    // stage.
    val boiler = "subscribe to our newsletter for updates every single day now"
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta unique text one two three"),
      (3L, s"$boiler entirely different content about catalyst optimizer rule batches"),
      (5L, "no duplicated content here just plain original prose entirely"),
      (10L, boiler) // the benchmark slice
    ).toDF("doc_id", "text")
    val standing = docs.filter($"doc_id" % 10 === 7) // empty standing corpus
    val benchmark = docs.filter($"doc_id" % 10 === 0)
    Dedup.writeBandIndex(standing, "band_idx_trim", buckets = 4)
    val got = scala.collection.mutable.Map[Long, String]()
    val ms = MemoryStream[(Long, String)]
    val q = DedupStream.ingestQuery(
      ms.toDF().toDF("doc_id", "text"), docs, "band_idx_trim", benchmark,
      trimSpans = true) { (out, _) =>
      got ++= out.select($"doc_id", $"text").as[(Long, String)].collect()
    }.start()
    try {
      val rows = docs.filter($"doc_id" % 10 =!= 0)
        .orderBy($"doc_id").as[(Long, String)].collect()
      ms.addData(rows.toSeq: _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS band_idx_trim")
    }
    // batch-side replay of the same chain: dedup → span trim → sweep over
    // the trimmed text (the Pipelines.trimmedReleaseCorpus stage order)
    val batchSide = {
      val batch = docs.filter($"doc_id" % 10 =!= 0)
      val trimmed = graft.operators.DupSpans
        .spanTrimmedCorpusOf(batch, 8, 2)
        .select($"doc_id", $"text_trimmed".as("text"))
      val contaminated = graft.operators.Decontamination
        .contaminationPairsOf(trimmed, benchmark)
        .select($"doc_id").distinct()
      trimmed.join(contaminated, Seq("doc_id"), "left_anti")
    }
    val expected = batchSide.as[(Long, String)].collect().toMap
    assert(got.toMap == expected)
    // the span genuinely trimmed: survivors 1 and 3 shipped WITHOUT the
    // boilerplate, and survived the sweep BECAUSE it was cut first
    assert(got.keySet == Set(1L, 3L, 5L))
    assert(got(1L) == "alpha beta gamma delta unique text one two three")
    assert(!got(3L).contains("subscribe"))
  }

  test("ingest with the C4 line tier: clean-before-dedup collapses pages that differ only in junk") {
    import graft.operators.LineClean
    val good1 = "The first sentence has at least five words."
    val good2 = "The second sentence also has enough words here."
    val good3 = "A third full sentence keeps the page alive."
    val other = Seq("Entirely different opening sentence with many words.",
      "Another unrelated line that clearly has enough words.",
      "The closing sentence of the other page stands alone.").mkString("\n")
    val standing = Seq((900L, "Standing corpus text that matches nothing else here."))
      .toDF("doc_id", "text")
    Dedup.writeBandIndex(standing, "band_idx_lineclean", buckets = 2)
    val benchmark = Seq((990L, "benchmark text far away from everything"))
      .toDF("doc_id", "text")
    val got = scala.collection.mutable.Map[Long, String]()
    val ms = MemoryStream[(Long, String)]
    val q = DedupStream.ingestQuery(
      ms.toDF().toDF("doc_id", "text"), standing, "band_idx_lineclean",
      benchmark, lineRules = Some(LineClean.c4)) { (clean, _) =>
      got ++= clean.select($"doc_id", $"text").as[(Long, String)].collect()
    }.start()
    try {
      ms.addData(
        // page 1 and page 2: same three good lines, different junk → after
        // cleaning they are byte-identical; exact dedup keeps doc 1
        (1L, Seq(good1, "tiny", good2, good3).mkString("\n")),
        (2L, Seq(good1, good2, "Enable JavaScript to continue reading.", good3).mkString("\n")),
        // page 3: nothing survives the line tier → page dropped
        (3L, Seq("short", "no punctuation line here at all", "x").mkString("\n")),
        // page 4: distinct clean content → survives
        (4L, other))
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS band_idx_lineclean")
    }
    assert(got.keySet == Set(1L, 4L))
    assert(got(1L) == Seq(good1, good2, good3).mkString("\n")) // junk line gone
    assert(got(4L) == other)
  }

  test("ingest with a frozen classifier gate: fixed coefficients decide per micro-batch") {
    // crafted model: margin = -1 + 10·f_len (f_len = min(len,500)/500) —
    // positive iff len >= 50; other features zero-weighted
    val gate = (-1.0, Array(10.0, 0.0, 0.0, 0.0, 0.0), 0.0)
    val standing = Seq((900L, "Standing corpus text that matches nothing else at all."))
      .toDF("doc_id", "text")
    graft.operators.Dedup.writeBandIndex(standing, "band_idx_clsgate", buckets = 2)
    val benchmark = Seq((990L, "benchmark text far away from everything"))
      .toDF("doc_id", "text")
    val got = scala.collection.mutable.Set[Long]()
    val ms = MemoryStream[(Long, String)]
    val q = DedupStream.ingestQuery(
      ms.toDF().toDF("doc_id", "text"), standing, "band_idx_clsgate",
      benchmark, classifierGate = Some(gate)) { (clean, _) =>
      got ++= clean.select($"doc_id").as[Long].collect()
    }.start()
    try {
      ms.addData(
        (1L, "x" * 60),  // len 60 >= 50 → margin 0.2 → kept
        (2L, "y" * 30))  // len 30 < 50 → margin -0.4 → dropped
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS band_idx_clsgate")
    }
    assert(got.toSet == Set(1L))
  }

  test("ingest with normalizedExact: formatting variants collapse in-batch") {
    // ALL-CAPS vs lowercase: char shingles are case-sensitive, so the
    // MinHash tier sees (nearly) disjoint sets and never fires — only the
    // normalized-exact tier can collapse this pair, which isolates the flag
    val a = "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG TONIGHT"
    val b = "the quick brown fox jumps over the lazy dog tonight"
    val c = "a completely different document about something else entirely"
    val standing = Seq((1L, "unrelated standing corpus text here"))
      .toDF("doc_id", "text")
    val allDocs = standing.union(
      Seq((10L, a), (20L, b), (30L, c)).toDF("doc_id", "text"))
    val benchmark = Seq((99L, "benchmark item that matches nothing at all"))
      .toDF("doc_id", "text")
    for ((flag, expected) <- Seq(true -> Set(10L, 30L),
        false -> Set(10L, 20L, 30L))) {
      Dedup.writeBandIndex(standing, "band_idx_norm", buckets = 2)
      val got = scala.collection.mutable.Set[Long]()
      val ms = MemoryStream[(Long, String)]
      val q = DedupStream.ingestQuery(ms.toDF().toDF("doc_id", "text"),
        allDocs, "band_idx_norm", benchmark, appendAfterProbe = false,
        normalizedExact = flag) { (out, _) =>
        got ++= out.select($"doc_id").as[Long].collect()
      }.start()
      try {
        ms.addData((10L, a), (20L, b), (30L, c))
        q.processAllAvailable()
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS band_idx_norm")
      }
      assert(got.toSet == expected, s"normalizedExact=$flag")
    }
  }

  test("probe-then-append finds a duplicate of an earlier micro-batch") {
    val text1 = "an entirely novel document about streaming ingest loops"
    val text2 = "an entirely novel document about streaming ingest loops!"
    val standing = Seq((1L, "the standing corpus has nothing like this"))
      .toDF("doc_id", "text")
    // the verify side must cover every doc the index can hold — standing
    // plus both incoming batches (in production: the growing docs table)
    val allDocs = standing.union(
      Seq((10L, text1), (20L, text2)).toDF("doc_id", "text"))
    Dedup.writeBandIndex(standing, "band_idx_ds2", buckets = 2)
    val perBatch = scala.collection.mutable.Map[Long, Set[(Long, Long, Double)]]()
    val ms = MemoryStream[(Long, String)]
    val q = DedupStream.incrementalDedupQuery(
      ms.toDF().toDF("doc_id", "text"), allDocs, "band_idx_ds2",
      appendAfterProbe = true, buckets = 2) { (pairs, id) =>
      perBatch(id) = pairs.as[(Long, Long, Double)].collect().toSet
    }.start()
    try {
      ms.addData((10L, text1)) // batch 0: no dup of the standing corpus
      q.processAllAvailable()
      ms.addData((20L, text2)) // batch 1: near-dup of batch 0's doc
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS band_idx_ds2")
    }
    assert(perBatch(0L).isEmpty, s"batch 0 matched: ${perBatch(0L)}")
    val hits = perBatch(1L).map { case (n, d, _) => (n, d) }
    assert(hits == Set((20L, 10L)),
      s"batch 1 should dup batch 0's doc only, got ${perBatch(1L)}")
  }

  test("tiered micro-batch probes equal the tiered batch probe; append maintains both indexes") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    // the re-crawl batch shape: exact re-fetches AND updated pages
    val batchDocs = docs.filter($"doc_id" % 10 === 0).select(
      ($"doc_id" + 1000000L).as("doc_id"),
      when($"doc_id" % 20 === 0,
        concat(coalesce($"text", lit("")), lit(" v2")))
        .otherwise($"text").as("text"))
    Dedup.writeBandIndex(docs, "band_idx_tds", buckets = 4)
    Dedup.writeExactIndex(docs, "exact_idx_tds", buckets = 4)
    val results = scala.collection.mutable.Set[(Long, Long, Double)]()
    val ms = MemoryStream[(Long, String)]
    val q = DedupStream.incrementalDedupQuery(
      ms.toDF().toDF("doc_id", "text"), docs, "band_idx_tds",
      appendAfterProbe = true, exactTable = Some("exact_idx_tds")) {
      (pairs, _) => results ++= pairs.as[(Long, Long, Double)].collect()
    }.start()
    val rows = batchDocs.select($"doc_id", coalesce($"text", lit("")))
      .as[(Long, String)].collect()
    try {
      val (first, second) = rows.splitAt(rows.length / 2)
      ms.addData(first.toSeq: _*)
      q.processAllAvailable()
      ms.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS band_idx_tds")
      spark.sql("DROP TABLE IF EXISTS exact_idx_tds")
    }
    // cross-micro-batch pairs cannot arise here (batch ids are disjoint
    // from corpus ids and the re-crawl texts only duplicate CORPUS texts,
    // with one exception: two batch docs re-fetching the same standing
    // text are exact twins of each other once appended) — so filter the
    // streamed result to standing-corpus partners before comparing
    val gotVsCorpus = results.toSet.filter(_._2 < 1000000L)
    // batch-twin comparison against fresh indexes (built after the stream
    // dropped its own tables)
    Dedup.writeBandIndex(docs, "band_idx_tds_x", buckets = 4)
    Dedup.writeExactIndex(docs, "exact_idx_tds_x", buckets = 4)
    try {
      val exp = Dedup.tieredIncrementalNearDupIndexed(docs,
        "band_idx_tds_x", "exact_idx_tds_x", batchDocs)
        .as[(Long, Long, Double)].collect().toSet
      assert(gotVsCorpus == exp)
      assert(exp.exists(_._3 == 1.0) && exp.exists(_._3 < 1.0),
        "fixture must exercise both tiers")
      // and any extra streamed pairs are batch-vs-earlier-batch appends at
      // jaccard 1.0 (same standing text re-fetched twice)
      assert((results.toSet -- gotVsCorpus).forall(_._3 == 1.0))
    } finally {
      spark.sql("DROP TABLE IF EXISTS band_idx_tds_x")
      spark.sql("DROP TABLE IF EXISTS exact_idx_tds_x")
    }
  }

  test("embedding micro-batch probes equal the batch probe on the same data") {
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    val batchVecs = emb.filter($"vec_id" % 10 === 0)
    Dedup.writeEmbeddingBandIndex(corpus, "emb_idx_ds", buckets = 4)
    val expected = Dedup
      .incrementalEmbeddingNearDupIndexed(corpus, "emb_idx_ds", batchVecs)
      .as[(Long, Long, Double)].collect().toSet
    val results = scala.collection.mutable.Set[(Long, Long, Double)]()
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = DedupStream.incrementalEmbeddingDedupQuery(
      ms.toDF().toDF("vec_id", "embedding"), corpus, "emb_idx_ds") { (pairs, _) =>
      results ++= pairs.as[(Long, Long, Double)].collect()
    }.start()
    try {
      val rows = batchVecs.select($"vec_id", $"embedding")
        .as[(Long, Seq[Float])].collect()
      val (first, second) = rows.splitAt(rows.length / 2)
      ms.addData(first.toSeq: _*)
      q.processAllAvailable()
      ms.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS emb_idx_ds")
    }
    assert(results.toSet == expected)
    assert(results.nonEmpty)
  }

  test("embedding probe-then-append finds a semantic dup of an earlier micro-batch") {
    val dim = 64
    def vec(axis: Int, noiseAxis: Int = -1): Seq[Float] = {
      val v = Array.fill(dim)(0.0f)
      v(axis) = 1.0f
      if (noiseAxis >= 0) v(noiseAxis) = 0.01f
      v.toSeq
    }
    val standing = Seq((1L, vec(0))).toDF("vec_id", "embedding")
    // verify side must cover standing + both incoming batches
    val allVecs = standing.union(
      Seq((10L, vec(1)), (20L, vec(1, noiseAxis = 2))).toDF("vec_id", "embedding"))
    Dedup.writeEmbeddingBandIndex(standing, "emb_idx_ds2", buckets = 2)
    val perBatch = scala.collection.mutable.Map[Long, Set[(Long, Long, Double)]]()
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = DedupStream.incrementalEmbeddingDedupQuery(
      ms.toDF().toDF("vec_id", "embedding"), allVecs, "emb_idx_ds2",
      appendAfterProbe = true, buckets = 2) { (pairs, id) =>
      perBatch(id) = pairs.as[(Long, Long, Double)].collect().toSet
    }.start()
    try {
      ms.addData((10L, vec(1))) // batch 0: orthogonal to the standing vector
      q.processAllAvailable()
      ms.addData((20L, vec(1, noiseAxis = 2))) // batch 1: near-dup of batch 0
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS emb_idx_ds2")
    }
    assert(perBatch(0L).isEmpty, s"batch 0 matched: ${perBatch(0L)}")
    val hits = perBatch(1L).map { case (n, d, _) => (n, d) }
    assert(hits == Set((20L, 10L)),
      s"batch 1 should dup batch 0's vector only, got ${perBatch(1L)}")
  }

  test("hash dedup stream: perceptual probe-then-append across micro-batches") {
    // standing signature differs from both arrivals in every 8-bit chunk;
    // the two arrivals differ from each other by ONE bit
    val standing = Seq((1L, 0x0f0f0f0f0f0f0f0fL)).toDF("id", "sig")
    Dedup.writeHashIndex(standing, "id", "sig", "hash_idx_ds",
      numChunks = 8, buckets = 2)
    val perBatch = scala.collection.mutable.Map[Long, Set[(Long, Long, Int)]]()
    val ms = MemoryStream[(Long, Long)]
    val q = DedupStream.hashDedupQuery(ms.toDF().toDF("id", "sig"),
      "hash_idx_ds", appendAfterProbe = true, buckets = 2) { (pairs, id) =>
      perBatch(id) = pairs.as[(Long, Long, Int)].collect().toSet
    }.start()
    try {
      ms.addData((10L, 0x7070707070707070L)) // no perceptual dup standing
      q.processAllAvailable()
      ms.addData((20L, 0x7070707070707071L)) // 1 bit from batch 0's image
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS hash_idx_ds")
    }
    assert(perBatch(0L).isEmpty, s"batch 0 matched: ${perBatch(0L)}")
    assert(perBatch(1L) == Set((20L, 10L, 1)),
      s"batch 1 should perceptually dup batch 0's item, got ${perBatch(1L)}")
  }

  test("bloom dedup stream: batch parity, then cross-batch drops when accumulating") {
    val docs = Tables.documents(spark, sf)
    val batchDocs = docs.filter($"doc_id" % 10 === 0).select(
      ($"doc_id" + 1000000L).as("doc_id"),
      when($"doc_id" % 20 === 0,
        concat(coalesce($"text", lit("")), lit(" v2")))
        .otherwise($"text").as("text"))
    // 1) parity with the batch operator over the same derived re-crawl
    val got = scala.collection.mutable.Set[Long]()
    val ms = MemoryStream[(Long, String)]
    val q = DedupStream.bloomDedupQuery(
      ms.toDF().toDF("doc_id", "text"), docs) { (ship, _) =>
      got ++= ship.select($"doc_id").as[Long].collect()
    }.start()
    try {
      val rows = batchDocs.as[(Long, String)].collect()
      val (a, b) = rows.splitAt(rows.length / 2)
      ms.addData(a.toSeq: _*)
      q.processAllAvailable()
      ms.addData(b.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val expected = Dedup.bloomIncrementalDedup(spark, sf)
      .select($"new_doc_id").as[Long].collect().toSet
    assert(got.toSet == expected)
    // 2) accumulate: a doc surviving batch 0 re-arrives in batch 1 under a
    // new id and is dropped on sketch evidence; a genuinely new doc passes
    val perBatch = scala.collection.mutable.Map[Long, Set[Long]]()
    val ms2 = MemoryStream[(Long, String)]
    val corpus = Seq((1L, "standing alpha"), (2L, "standing beta"))
      .toDF("doc_id", "text")
    val q2 = DedupStream.bloomDedupQuery(
      ms2.toDF().toDF("doc_id", "text"), corpus,
      accumulate = true) { (ship, id) =>
      perBatch(id) = ship.select($"doc_id").as[Long].collect().toSet
    }.start()
    try {
      ms2.addData((10L, "fresh gamma"), (11L, "standing alpha"))
      q2.processAllAvailable()
      ms2.addData((20L, "fresh gamma"), (21L, "fresh delta"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(perBatch(0L) == Set(10L)) // corpus dup dropped exactly
    assert(perBatch(1L) == Set(21L),
      s"dup of batch 0's survivor must drop on sketch evidence: ${perBatch(1L)}")
  }
}
