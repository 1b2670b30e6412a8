package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Similarity}
import graft.sources.Tables
import graft.util.{BatchAppend, Tombstones}

/** The DELETE contract for standing indexes (round-15 stretch): tombstone
  * rows folded at probe, physically absorbed at compaction, with the
  * carry-fence interplay. The absorbed end states are oracle-checked
  * (`ivf_topk_deleted`, `bm25_topk_deleted` share their batch oracles);
  * this suite pins the PRE-absorb fold, delete visibility, the (N, Σdl)
  * correction, and the carried-file masking rule those entries can't
  * exercise. */
class TombstoneSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("IVF: a tombstone folds out of the next probe with no rewrite; absorb is physical and retires a carry-free tombstone set") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = tmp("graft-ts-ivf")
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb.filter($"vec_id" % 4 =!= 3)), path)
    val queries = emb.filter($"vec_id" % 4 === 3).limit(4)
    def probe() = Similarity.queryStandingIvf(
        Similarity.prepareIvfIndex(spark, path), queries)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val before = probe()
    // junk lands and disturbs the ranking…
    val junk = emb.filter($"vec_id" % 4 === 1)
      .select(($"vec_id" + 5000000L).as("vec_id"), $"embedding")
    Similarity.appendToIvfIndex(junk, path)
    assert(probe() != before, "fixture degenerate: junk never ranked")
    // …the delete is ONE tombstone append — no index rewrite — and the
    // very next probe excludes every junk id
    val rowsBefore = spark.read.parquet(s"$path/corpus").count()
    Similarity.deleteFromIvfIndex(junk.select($"vec_id"), path)
    assert(spark.read.parquet(s"$path/corpus").count() == rowsBefore,
      "delete must not rewrite the corpus")
    assert(probe() == before, "tombstoned rows leaked into the probe")
    // absorb: the rewrite drops the rows physically, carry-free → the
    // tombstone directory retires and probes stay identical
    val stats = Similarity.absorbIvfDeletes(spark, path)
    assert(stats.rows > 0L)
    assert(!Tombstones.exists(spark, path))
    assert(spark.read.parquet(s"$path/corpus")
      .filter($"vec_id" >= 5000000L).count() == 0L, "absorb left junk rows")
    assert(probe() == before)
  }

  test("IVF absorb under a carry fence: carried files keep masking via kept tombstones; a later carry-free absorb retires them") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = tmp("graft-ts-fence")
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb.filter($"vec_id" % 4 === 0)), path)
    val queries = emb.filter($"vec_id" % 4 === 3).limit(4)
    def probe() = Similarity.queryStandingIvf(
        Similarity.prepareIvfIndex(spark, path), queries)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val before = probe()
    // the junk batch arrives THROUGH the tagged ingest protocol (batch 7)
    // and is then retracted while still above the compaction fence
    val junk = emb.filter($"vec_id" % 4 === 1)
      .select(($"vec_id" + 5000000L).as("vec_id"), $"embedding")
    val centers = Similarity.loadIvfIndex(spark, path).centers
    BatchAppend.append(
      junk.select($"vec_id", $"embedding",
        graft.functions.VectorExpressions
          .nearestCenter($"embedding", centers).as("cell")),
      s"$path/corpus", BatchAppend.tag(7L), partitionCol = Some("cell"))
    Similarity.deleteFromIvfIndex(junk.select($"vec_id"), path)
    // absorb with batch 7 still replayable: its files carry verbatim, so
    // the tombstones MUST survive to keep masking the carried rows
    val stats = Similarity.absorbIvfDeletes(spark, path,
      safeBatchFence = Some(6L))
    assert(stats.carriedFiles > 0L, "fixture degenerate: nothing carried")
    assert(Tombstones.exists(spark, path),
      "tombstones retired while carried files still hold masked rows")
    assert(spark.read.parquet(s"$path/corpus")
      .filter($"vec_id" >= 5000000L).count() > 0L) // physically present…
    assert(probe() == before) // …but still masked
    // once the batch is committed (fence advances), the next absorb is
    // carry-free: rows drop, tombstones retire
    val stats2 = Similarity.absorbIvfDeletes(spark, path,
      safeBatchFence = Some(7L))
    assert(stats2.carriedFiles == 0L)
    assert(!Tombstones.exists(spark, path))
    assert(spark.read.parquet(s"$path/corpus")
      .filter($"vec_id" >= 5000000L).count() == 0L)
    assert(probe() == before)
  }

  test("BM25: delete corrects (N, Σdl) and the candidate slice — probe ≡ a fresh index over the retained corpus; signature fires for serving") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val path = tmp("graft-ts-bm25")
    writeAll(docs, path)
    val queries = docs.filter($"doc_id" < 3)
      .select($"doc_id".as("query_id"), $"text")
    // retract a REAL slice of the corpus (docs 5..9 — in-corpus deletes,
    // harder than retracting junk: N, Σdl, df, and rankings all shift for
    // every remaining doc) plus one empty doc if present
    val deleted = docs.filter($"doc_id" >= 5L && $"doc_id" < 10L)
      .select($"doc_id")
    val sigBefore = Bm25.statsSignature(spark, path)
    Bm25.deleteFromBm25Index(spark, path, deleted)
    assert(Bm25.statsSignature(spark, path) != sigBefore,
      "a delete must change the serving currency signature")
    // the reference: a FRESH index over exactly the retained corpus — the
    // tombstoned probe must be bit-equal (constants correction included;
    // a missed N correction shifts every idf and fails this)
    val refPath = tmp("graft-ts-bm25-ref")
    writeAll(docs.join(deleted, Seq("doc_id"), "left_anti"), refPath)
    val got = Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq
    val want = Bm25.queryBm25Index(spark, refPath, queries)
      .collect().map(_.toSeq).toSeq
    assert(got == want, s"${got.take(3)} vs ${want.take(3)}")
    val deletedIds = deleted.as[Long].collect().toSet
    assert(!got.exists(r => deletedIds.contains(r(2).asInstanceOf[Long])))
    // double delete of the same ids: idempotent (already-tombstoned ids
    // are skipped at delete time — at most one tombstone row per doc ever)
    Bm25.deleteFromBm25Index(spark, path, deleted)
    assert(Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq == want, "double delete double-counted")
  }

  test("BM25: deleting an id with no live committed membership fails loudly — never a silently shifted idf") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val path = tmp("graft-ts-bm25-unknown")
    writeAll(docs, path)
    val queries = docs.filter($"doc_id" < 3)
      .select($"doc_id".as("query_id"), $"text")
    val before = Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq
    // a takedown for an id never ingested must be REJECTED, not recorded:
    // a tombstone for it would permanently decrement N
    val unknown = spark.createDataFrame(Seq(Tuple1(987654321L)))
      .toDF("doc_id")
    val ex = intercept[IllegalArgumentException] {
      Bm25.deleteFromBm25Index(spark, path, unknown)
    }
    assert(ex.getMessage.contains("987654321"))
    // nothing landed: no tombstones, probe unchanged
    assert(!Tombstones.exists(spark, path))
    assert(Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq == before)
    // a doc in a TORN (uncommitted) segment is equally unknown: postings
    // exist but no stats commit row — membership is committed-only
    val torn = spark.createDataFrame(Seq((777001L, "torn segment doc")))
      .toDF("doc_id", "text")
    val statsDir = new org.apache.hadoop.fs.Path(s"$path/stats")
    val fs = statsDir.getFileSystem(spark.sessionState.newHadoopConf())
    def statsFiles() = fs.listStatus(statsDir)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).toSet
    val preAppend = statsFiles()
    Bm25.appendToBm25Index(torn, path)
    // tear the append: remove exactly its stats commit record(s)
    (statsFiles() -- preAppend).foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(statsDir, n), false))
    intercept[IllegalArgumentException] {
      Bm25.deleteFromBm25Index(spark, path, torn.select($"doc_id"))
    }
    assert(!Tombstones.exists(spark, path))
  }

  test("BM25: an EMPTY doc (zero postings, counted in N) is deletable through the empties membership; its correction is dl = 0") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .filter($"doc_id" < 40)
    val path = tmp("graft-ts-bm25-empty")
    writeAll(docs.unionByName(spark.createDataFrame(
      Seq((800001L, ""))).toDF("doc_id", "text")), path)
    val queries = docs.filter($"doc_id" < 3)
      .select($"doc_id".as("query_id"), $"text")
    // with the empty doc in: N = 41 — deleting it must restore the
    // pure-corpus constants exactly (bit-equal probe vs never-appended)
    val refPath = tmp("graft-ts-bm25-empty-ref")
    writeAll(docs, refPath)
    Bm25.deleteFromBm25Index(spark, path,
      spark.createDataFrame(Seq(Tuple1(800001L))).toDF("doc_id"))
    assert(Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq ==
      Bm25.queryBm25Index(spark, refPath, queries)
        .collect().map(_.toSeq).toSeq,
      "empty-doc delete must shrink N by 1 and Σdl by 0")
  }

  test("BM25: absorb FOLDS the tombstone correction into one commit record, retires the files, and probes stay bit-equal — including across the record-written/files-present crash window") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val path = tmp("graft-ts-bm25-fold")
    writeAll(docs, path)
    val queries = docs.filter($"doc_id" < 3)
      .select($"doc_id".as("query_id"), $"text")
    val deleted = docs.filter($"doc_id" >= 5L && $"doc_id" < 10L)
      .select($"doc_id")
    Bm25.deleteFromBm25Index(spark, path, deleted)
    val want = Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq
    // snapshot the live tombstone files, then absorb+fold
    val tsFiles = Tombstones.dataFiles(spark, path)
    assert(tsFiles.nonEmpty)
    val sigBefore = Bm25.statsSignature(spark, path)
    val stats = Bm25.absorbBm25Deletes(spark, path)
    assert(stats.carriedFiles == 0L)
    assert(Bm25.statsSignature(spark, path) != sigBefore,
      "a fold must change the serving currency signature")
    // fold ≡ the unfolded correction: bit-equal probes, files retired
    assert(!Tombstones.exists(spark, path),
      "carry-free absorb must retire the folded tombstone files")
    assert(Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq == want)
    // CRASH WINDOW: fold record written but file GC never ran — put the
    // folded files back; readers must exclude them BY NAME (no double
    // count: the record already carries their correction)
    val fs = new org.apache.hadoop.fs.Path(Tombstones.dir(path))
      .getFileSystem(spark.sessionState.newHadoopConf())
    val junkSrc = tmp("graft-ts-bm25-fold-src")
    Bm25.deleteFromBm25Index( // rebuild identical tombstone CONTENT…
      spark, { writeAll(docs, junkSrc); junkSrc }, deleted)
    Tombstones.dataFiles(spark, junkSrc).zip(tsFiles).foreach {
      case (src, orig) => // …restored under the ORIGINAL folded names
        val dst = new org.apache.hadoop.fs.Path(
          Tombstones.dir(path), orig.getPath.getName)
        assert(org.apache.hadoop.fs.FileUtil.copy(fs, src.getPath, fs, dst,
          false, true, spark.sessionState.newHadoopConf()))
    }
    assert(Tombstones.exists(spark, path)) // files physically back…
    assert(Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq == want, // …but excluded by name
      "folded files present on disk must not double-count the correction")
    // a LATER delete after the fold stays live and correct on top of it
    val more = docs.filter($"doc_id" >= 10L && $"doc_id" < 12L)
      .select($"doc_id")
    Bm25.deleteFromBm25Index(spark, path, more)
    val refPath = tmp("graft-ts-bm25-fold-ref")
    writeAll(docs.join(deleted.unionByName(more), Seq("doc_id"),
      "left_anti"), refPath)
    assert(Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq ==
      Bm25.queryBm25Index(spark, refPath, queries)
        .collect().map(_.toSeq).toSeq,
      "post-fold deletes must stack on the folded correction")
    // the next absorb GCs the crash-window leftovers AND folds the new
    // delete — medium bounded again
    val _ = Bm25.absorbBm25Deletes(spark, path)
    assert(!Tombstones.exists(spark, path))
    assert(Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq ==
      Bm25.queryBm25Index(spark, refPath, queries)
        .collect().map(_.toSeq).toSeq)
  }

  private def writeAll(docs: org.apache.spark.sql.DataFrame,
      path: String): Unit = Bm25.writeBm25Index(docs, path)

  test("code tiers (PQ / IVF×PQ / SQ8): a tombstone folds out of every standing probe with no rewrite") {
    import graft.operators.{Pq, Sq}
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
      .filter($"embedding".isNotNull)
    val corpus = emb.filter($"vec_id" % 4 =!= 3)
    val queries = emb.filter($"vec_id" % 4 === 3).limit(3)
    // mid-corpus ids whose retraction must change nothing but their absence
    val dead = corpus.filter($"vec_id" % 7 === 0).select($"vec_id")
    val deadIds = dead.as[Long].collect().toSet
    val retained = corpus.join(dead, Seq("vec_id"), "left_anti")

    // PQ: probe after delete ≡ probe of an index built over the retained
    // corpus (same codebooks — the model is trained once on the full set,
    // deletion is row-level, not model-level)
    val model = Pq.train(corpus)
    val pqA = tmp("graft-ts-pq"); val pqB = tmp("graft-ts-pq-ref")
    Pq.writePqIndex(corpus, model, pqA)
    Pq.writePqIndex(retained, model, pqB)
    Pq.deleteFromPqIndex(dead, pqA)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(rows(Pq.queryStandingPq(Pq.preparePqIndex(spark, pqA), queries)) ==
      rows(Pq.queryStandingPq(Pq.preparePqIndex(spark, pqB), queries)))
    assert(!rows(Pq.queryStandingPq(Pq.preparePqIndex(spark, pqA), queries))
      .exists(r => deadIds.contains(r(1).asInstanceOf[Long])))

    // IVF×PQ: same contract through the cell-pruned composed fold (the
    // residual fold shares prunedCodes, so it inherits the same path)
    val index = Similarity.buildIvfIndex(corpus)
    val ivfpqA = tmp("graft-ts-ivfpq"); val ivfpqB = tmp("graft-ts-ivfpq-ref")
    Pq.writeIvfPqIndex(index.bucketed, model, index.centers, ivfpqA)
    Pq.writeIvfPqIndex(
      index.bucketed.join(dead, Seq("vec_id"), "left_anti"), model,
      index.centers, ivfpqB)
    Pq.deleteFromPqIndex(dead, ivfpqA)
    assert(rows(Pq.queryStandingIvfPq(
        Pq.prepareIvfPqIndex(spark, ivfpqA), queries)) ==
      rows(Pq.queryStandingIvfPq(
        Pq.prepareIvfPqIndex(spark, ivfpqB), queries)))

    // SQ8: same contract through the integer-L2 coded scan
    val sqModel = Sq.fit(corpus)
    val sqA = tmp("graft-ts-sq"); val sqB = tmp("graft-ts-sq-ref")
    Sq.writeSqIndex(corpus, sqModel, sqA)
    Sq.writeSqIndex(retained, sqModel, sqB)
    Sq.deleteFromSqIndex(dead, sqA)
    assert(rows(Sq.queryStandingSq(Sq.prepareSqIndex(spark, sqA), queries)) ==
      rows(Sq.queryStandingSq(Sq.prepareSqIndex(spark, sqB), queries)))
  }

  test("dedup table indexes (embedding band / perceptual hash): tombstones fold out of probes; rebuild and compaction absorb and retire") {
    import graft.operators.Dedup
    // ---- embedding band index: fold at probe, absorb via REBUILD (the
    // caller's corpus still contains the victim — the rebuild must drop it)
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
      .filter($"embedding".isNotNull)
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    val batch = emb.filter($"vec_id" % 10 === 0)
    Dedup.writeEmbeddingBandIndex(corpus, "emb_idx_ts", buckets = 4)
    def probeE(): Set[(Long, Long)] =
      Dedup.incrementalEmbeddingNearDupIndexed(corpus, "emb_idx_ts", batch)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      val before = probeE()
      assert(before.nonEmpty, "fixture degenerate: no embedding pairs")
      val victim = before.head._2
      Dedup.deleteFromIndexTable(spark, "emb_idx_ts",
        Seq(Tuple1(victim)).toDF("vec_id"))
      val after = probeE()
      assert(after == before.filterNot(_._2 == victim),
        "the fold must remove exactly the retracted vec's pairs")
      Dedup.rebuildEmbeddingBandIndex(corpus, "emb_idx_ts", buckets = 4)
      assert(!Tombstones.exists(spark,
        Dedup.indexTombstoneRoot(spark, "emb_idx_ts")),
        "rebuild absorption must retire the tombstones")
      assert(probeE() == after,
        "the rebuilt index must exclude the absorbed vec")
    } finally spark.sql("DROP TABLE IF EXISTS emb_idx_ts")

    // ---- perceptual hash index: fold at probe, absorb via COMPACTION
    // (the chunk-geometry property must ride the absorbing rewrite)
    val sigs = graft.multimodal.Media.imageAHash(
      graft.multimodal.Media.synthesizeImageVariants(spark, 100)).toDF()
    val hCorpus = sigs.filter($"media_id" < 150)
    val hBatch = sigs.filter($"media_id" >= 150)
    Dedup.writeHashIndex(hCorpus, "media_id", "ahash", "hash_idx_ts",
      numChunks = 8, buckets = 4)
    def probeH(): Set[(Long, Long, Int)] =
      Dedup.hammingIndexProbe("hash_idx_ts", hBatch, "media_id", "ahash",
        numChunks = 8, maxHamming = 6)
        .as[(Long, Long, Int)].collect().toSet
    try {
      val hBefore = probeH()
      assert(hBefore.nonEmpty, "fixture degenerate: no hamming pairs")
      val hVictim = hBefore.head._2
      Dedup.deleteFromIndexTable(spark, "hash_idx_ts",
        Seq(Tuple1(hVictim)).toDF("media_id"))
      val hAfter = probeH()
      assert(hAfter == hBefore.filterNot(_._2 == hVictim))
      Dedup.compactIndexTable(spark, "hash_idx_ts")
      assert(!Tombstones.exists(spark,
        Dedup.indexTombstoneRoot(spark, "hash_idx_ts")),
        "compaction absorption must retire the tombstones")
      assert(probeH() == hAfter,
        "the compacted index must exclude the absorbed signature " +
          "(and keep its chunk geometry)")
    } finally spark.sql("DROP TABLE IF EXISTS hash_idx_ts")
  }

  test("exact-hash tier: a tombstoned doc leaves the exact tier of the TIERED probe — and its batch twin falls through to the band tier") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .filter(length(coalesce($"text", lit(""))) >= 5)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    // one batch doc re-ingested verbatim: resolves in tier 1 against its
    // standing exact twin until that twin is retracted. The seed doc's
    // text must be UNIQUE in the corpus (the fixtures plant duplicates)
    // or tier 1 would keep matching a second twin after the retraction.
    val orig = corpus.groupBy($"text")
      .agg(count(lit(1)).as("n"), min($"doc_id").as("doc_id"))
      .filter($"n" === 1).orderBy($"doc_id").limit(1)
      .select($"doc_id", $"text").as[(Long, String)].head()
    val batch = Seq((orig._1 + 3000000L, orig._2)).toDF("doc_id", "text")
    Dedup.writeBandIndex(corpus, "band_idx_ext", buckets = 4)
    Dedup.writeExactIndex(corpus, "exact_idx_ext", buckets = 4)
    def probe(): Set[(Long, Long, Double)] =
      Dedup.tieredIncrementalNearDupIndexed(corpus, "band_idx_ext",
        "exact_idx_ext", batch)
        .as[(Long, Long, Double)].collect().toSet
    try {
      val before = probe()
      assert(before.contains((orig._1 + 3000000L, orig._1, 1.0)),
        s"fixture degenerate: no exact-tier pair in $before")
      // retract the standing twin from the EXACT index only: tier 1 must
      // stop matching it, and the batch doc falls through to the band
      // tier — where the un-retracted band index still pairs it (the
      // per-index independence of the tombstone media)
      Dedup.deleteFromIndexTable(spark, "exact_idx_ext",
        Seq(Tuple1(orig._1)).toDF("doc_id"))
      val after = probe()
      assert(after.contains((orig._1 + 3000000L, orig._1, 1.0)),
        "band tier should still pair the twin (only the exact index was " +
          s"retracted): $after")
      // retract from the band index too: the pair is fully gone
      Dedup.deleteFromIndexTable(spark, "band_idx_ext",
        Seq(Tuple1(orig._1)).toDF("doc_id"))
      assert(!probe().exists(_._2 == orig._1),
        "a doc retracted from both indexes kept pairing")
      // absorption on the exact medium rides compactIndexTable like the
      // others; the probe is unchanged and the medium retires
      Dedup.compactIndexTable(spark, "exact_idx_ext")
      assert(!Tombstones.exists(spark,
        Dedup.indexTombstoneRoot(spark, "exact_idx_ext")))
      assert(!probe().exists(_._2 == orig._1))
    } finally {
      spark.sql("DROP TABLE IF EXISTS band_idx_ext")
      spark.sql("DROP TABLE IF EXISTS exact_idx_ext")
    }
  }

  test("code tiers: absorb makes deletes physical in codes AND raw, retires tombstones only when BOTH are carry-free, and a post-absorb retrain resurrects nothing") {
    import graft.operators.{Pq, Sq}
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
      .filter($"embedding".isNotNull)
    val corpus = emb.filter($"vec_id" % 4 =!= 3)
    val queries = emb.filter($"vec_id" % 4 === 3).limit(3)
    val dead = corpus.filter($"vec_id" % 7 === 0).select($"vec_id")
    val deadIds = dead.as[Long].collect().toSet
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select($"vec_id").as[Long].collect().toSet
    val retainedIds = ids(corpus) -- deadIds

    // ---- PQ: the resurrection chain the verdict flagged — absorb codes,
    // clear tombstones, retrain from raw — must be IMPOSSIBLE through the
    // absorb API because it rewrites raw in the same unit
    val model = Pq.train(corpus)
    val pq = tmp("graft-abs-pq")
    Pq.writePqIndex(corpus, model, pq)
    corpus.write.parquet(s"$pq/raw") // the rerank/refit tier the loop keeps
    Pq.deleteFromPqIndex(dead, pq)
    // pre-absorb: raw still holds the retracted vectors — the hazard
    assert(ids(spark.read.parquet(s"$pq/raw"))
      .intersect(deadIds).nonEmpty)
    val stats = Pq.absorbPqDeletes(spark, pq)
    assert(stats.forall(_.carriedFiles == 0L))
    assert(!Tombstones.exists(spark, pq),
      "carry-free absorb must retire the tombstones")
    assert(ids(spark.read.parquet(s"$pq/codes")) == retainedIds,
      "codes must be physically delete-free after absorb")
    assert(ids(spark.read.parquet(s"$pq/raw")) == retainedIds,
      "raw must be physically delete-free after absorb")
    // retrain re-encodes from raw — with raw absorbed, nothing resurrects
    Pq.retrainPqIndex(spark.read.parquet(s"$pq/raw"), pq)
    assert(ids(spark.read.parquet(s"$pq/codes")) == retainedIds,
      "a post-absorb retrain must not resurrect retracted codes")
    val served = Pq.queryStandingPq(Pq.preparePqIndex(spark, pq), queries)
      .collect().map(_.getLong(1)).toSet
    assert(served.nonEmpty && served.intersect(deadIds).isEmpty)

    // ---- SQ8 with a CARRY FENCE: a still-replayable tagged batch in raw
    // rides through verbatim, so its masked rows survive — tombstones must
    // NOT retire until a later carry-free absorb
    val sqModel = Sq.fit(corpus)
    val sq = tmp("graft-abs-sq")
    Sq.writeSqIndex(corpus, sqModel, sq)
    corpus.write.parquet(s"$sq/raw")
    val junk = corpus.filter($"vec_id" % 5 === 0)
      .select(($"vec_id" + 6000000L).as("vec_id"), $"embedding")
    val junkIds = ids(junk)
    // the ingest shape: one tagged batch lands in BOTH media
    BatchAppend.append(junk, s"$sq/raw", BatchAppend.tag(9L))
    BatchAppend.append(Sq.encode(junk, sqModel), s"$sq/codes",
      BatchAppend.tag(9L))
    Sq.deleteFromSqIndex(spark.createDataFrame(
      junkIds.toSeq.map(Tuple1(_))).toDF("vec_id"), sq)
    // fence at 8: batch 9 is still replayable — carried in both media
    val fenced = Sq.absorbSqDeletes(spark, sq, safeBatchFence = Some(8L))
    assert(fenced.exists(_.carriedFiles > 0L))
    assert(Tombstones.exists(spark, sq),
      "tombstones retired while a carried file still held masked rows")
    // masked throughout the window: the probe never serves the junk
    val probe1 = Sq.queryStandingSq(Sq.prepareSqIndex(spark, sq), queries)
      .collect().map(_.getLong(1)).toSet
    assert(probe1.intersect(junkIds).isEmpty)
    // fence advances past the batch: absorb is carry-free, retires, and
    // the refit corpus is clean — retrain resurrects nothing
    val free = Sq.absorbSqDeletes(spark, sq, safeBatchFence = Some(9L))
    assert(free.forall(_.carriedFiles == 0L))
    assert(!Tombstones.exists(spark, sq))
    assert(ids(spark.read.parquet(s"$sq/raw"))
      .intersect(junkIds).isEmpty)
    Sq.retrainSqIndex(spark.read.parquet(s"$sq/raw"), sq)
    val probe2 = Sq.queryStandingSq(Sq.prepareSqIndex(spark, sq), queries)
      .collect().map(_.getLong(1)).toSet
    assert(probe2.nonEmpty && probe2.intersect(junkIds).isEmpty)

    // ---- composed (IVF×PQ): the cell-partitioned codes medium absorbs
    // through the same unit (directory pruning preserved by partitionCol)
    val index = Similarity.buildIvfIndex(corpus)
    val ivfpq = tmp("graft-abs-ivfpq")
    Pq.writeIvfPqIndex(index.bucketed, model, index.centers, ivfpq)
    corpus.write.parquet(s"$ivfpq/raw")
    Pq.deleteFromPqIndex(dead, ivfpq)
    val cstats = Pq.absorbIvfPqDeletes(spark, ivfpq)
    assert(cstats.forall(_.carriedFiles == 0L))
    assert(!Tombstones.exists(spark, ivfpq))
    assert(ids(spark.read.parquet(s"$ivfpq/codes")) == retainedIds)
    assert(ids(spark.read.parquet(s"$ivfpq/raw")) == retainedIds)
    Pq.retrainIvfPqIndex(spark.read.parquet(s"$ivfpq/raw"), ivfpq)
    assert(ids(spark.read.parquet(s"$ivfpq/codes")) == retainedIds,
      "composed retrain must not resurrect retracted codes")
  }

  test("snapshot retirement: clearFiles retires only the named files — a tombstone landing after the snapshot stays live") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = tmp("graft-ts-snapshot")
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb.filter($"vec_id" % 4 =!= 3)), path)
    // first delete lands; an absorb would snapshot exactly these files
    Similarity.deleteFromIvfIndex(
      spark.createDataFrame(Seq(Tuple1(1L), Tuple1(2L))).toDF("vec_id"),
      path)
    val snapshot = Tombstones.dataFiles(spark, path)
    assert(snapshot.nonEmpty)
    // a second delete lands MID-ABSORB (after the snapshot listing)
    Similarity.deleteFromIvfIndex(
      spark.createDataFrame(Seq(Tuple1(5L))).toDF("vec_id"), path)
    // retirement is snapshot-scoped: the late tombstone must survive it
    Tombstones.clearFiles(spark, path, snapshot)
    val live = Tombstones.idsOf(spark, path, "vec_id")
      .map(_.as[Long].collect().toSet).getOrElse(Set.empty[Long])
    assert(live == Set(5L),
      s"late-landed tombstone lost by snapshot retirement: $live")
    // the late delete still masks, and the NEXT absorb retires it
    val queries = emb.filter($"vec_id" % 4 === 3).limit(3)
    val got = Similarity.queryStandingIvf(
        Similarity.prepareIvfIndex(spark, path), queries)
      .collect().map(_.getLong(1)).toSet
    assert(!got.contains(5L))
    val stats = Similarity.absorbIvfDeletes(spark, path)
    assert(stats.carriedFiles == 0L)
    assert(!Tombstones.exists(spark, path))
    assert(spark.read.parquet(s"$path/corpus")
      .filter($"vec_id" === 5L).count() == 0L)
  }

  test("BM25: an absorbed EMPTY doc cannot be re-deleted — the empties medium absorbs with the postings, so a folded empty doc is unknown membership") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .filter($"doc_id" < 40)
    val path = tmp("graft-ts-bm25-empty-absorb")
    writeAll(docs.unionByName(spark.createDataFrame(
      Seq((800002L, ""))).toDF("doc_id", "text")), path)
    val queries = docs.filter($"doc_id" < 3)
      .select($"doc_id".as("query_id"), $"text")
    // delete the empty doc (membership via empties/, correction dl = 0)
    Bm25.deleteFromBm25Index(spark, path,
      spark.createDataFrame(Seq(Tuple1(800002L))).toDF("doc_id"))
    val want = Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq
    // absorb: postings AND empties compact carry-free, correction folds
    val stats = Bm25.absorbBm25Deletes(spark, path)
    assert(stats.carriedFiles == 0L)
    assert(!Tombstones.exists(spark, path))
    // the membership row is PHYSICALLY gone with the fold — a re-delete
    // must fail loudly (a second (N-1, dl=0) correction would be
    // permanent double-counted idf skew)
    val ex = intercept[IllegalArgumentException] {
      Bm25.deleteFromBm25Index(spark, path,
        spark.createDataFrame(Seq(Tuple1(800002L))).toDF("doc_id"))
    }
    assert(ex.getMessage.contains("800002"))
    // constants stayed single-counted: probe ≡ a fresh index over the
    // retained corpus, before and after the rejected re-delete
    val refPath = tmp("graft-ts-bm25-empty-absorb-ref")
    writeAll(docs, refPath)
    val ref = Bm25.queryBm25Index(spark, refPath, queries)
      .collect().map(_.toSeq).toSeq
    assert(want == ref)
    assert(Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq == ref)
    // a NON-empty doc's delete still works over the compacted empties
    Bm25.deleteFromBm25Index(spark, path,
      docs.filter($"doc_id" === 7L).select($"doc_id"))
    val refPath2 = tmp("graft-ts-bm25-empty-absorb-ref2")
    writeAll(docs.filter($"doc_id" =!= 7L), refPath2)
    assert(Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq ==
      Bm25.queryBm25Index(spark, refPath2, queries)
        .collect().map(_.toSeq).toSeq)
  }
}
