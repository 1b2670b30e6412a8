package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Bm25
import graft.sources.Tables
import graft.streaming.LexStream

/** BM25 serving: stream ≡ batch over the standing index, and the
  * stats-signature currency check — appends change (N, Σdl), so the next
  * trigger must score with the refreshed constants, not just see the new
  * postings. */
class LexStreamSpec extends SparkTestBase {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("micro-batch probes equal the batch probe; appended docs searchable with refreshed stats") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-bm25-stream").toString
    Bm25.writeBm25Index(corpus, path)
    val queries = docs.filter($"doc_id" % 10 === 0)
      .as[(Long, String)].collect().toSeq.sortBy(_._1).take(6)
      .map { case (id, t) => (id, String.valueOf(t)) } // null-safe
    def batchTopK(qs: Seq[(Long, String)]) =
      Bm25.queryBm25Index(spark, path,
        qs.toDF("query_id", "text"))
        .as[(Long, Long, Long, Long)].collect().toSet
    val results = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    val ms = MemoryStream[(Long, String)]
    val q = LexStream.bm25SearchQuery(
      ms.toDF().toDF("query_id", "text"), path) { (topk, _) =>
      results ++= topk.as[(Long, Long, Long, Long)].collect()
    }.start()
    try {
      // split delivery must union to the one-shot batch probe: the
      // standing handle's folded constants ≡ the batch probe's fold
      val (first, second) = queries.splitAt(3)
      ms.addData(first: _*)
      q.processAllAvailable()
      ms.addData(second: _*)
      q.processAllAvailable()
      assert(results.toSet == batchTopK(queries))
      assert(results.nonEmpty)
      // segment append UNDER the live stream: a new doc with the query's
      // exact text must (a) surface in the next trigger — new postings
      // files visible — and (b) the whole ranking must equal the
      // POST-append batch probe — (N, Σdl) re-folded via the signature
      // check, not served stale (scores shift for every doc when N does)
      val (qid, qtext) = queries.head
      Bm25.appendToBm25Index(Seq((990000L, qtext)).toDF("doc_id", "text"),
        path)
      results.clear()
      ms.addData((qid, qtext))
      q.processAllAvailable()
      assert(results.exists(_._3 == 990000L),
        s"appended doc not searchable: ${results.toSeq.sortBy(_._2).take(3)}")
      assert(results.toSet == batchTopK(Seq((qid, qtext))),
        "post-append serving ranking diverges from the post-append batch probe")
    } finally q.stop()
  }

  test("ingest loop: tagged segments; a replayed batch re-publishes, never double-counts; a torn replay stays invisible until completed") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-bm25-ingest").toString
    Bm25.writeBm25Index(docs.filter($"doc_id" % 3 === 0), path)
    val rows = scala.collection.mutable.Buffer[(Long, Long, Long, Boolean)]()
    def drive(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      graft.streaming.LexStream.processBm25IngestBatch(b, id, path, None) {
        (r, _) => rows ++= r.as[(Long, Long, Long, Boolean)].collect()
      }
    drive(docs.filter($"doc_id" % 3 === 1), 0L)
    drive(docs.filter($"doc_id" % 3 === 2), 1L)
    val queries = docs.filter($"doc_id" < 3)
      .select($"doc_id".as("query_id"), $"text")
    // segments union to the full corpus → probe ≡ the batch scorer
    val batch = Bm25.bm25TopK(spark, sf).collect().map(_.toSeq).toSeq
    assert(Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq == batch)
    // REPLAY batch 1 (foreachBatch's at-least-once): the tagged protocol
    // re-publishes the same segment — row counts and scoring unchanged, no
    // df/N double-count (the failure a plain append would produce)
    val (pBefore, sBefore) = (
      spark.read.parquet(s"$path/postings").count(),
      spark.read.parquet(s"$path/stats").count())
    drive(docs.filter($"doc_id" % 3 === 2), 1L)
    assert(spark.read.parquet(s"$path/postings").count() == pBefore)
    assert(spark.read.parquet(s"$path/stats").count() == sBefore)
    assert(Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq == batch)
    assert(rows.map(_._1) == Seq(0L, 1L, 1L) && rows.forall(!_._4))
    // TORN replay: batch 1's stats commit row dies after the postings
    // published (the crash window between the two BatchAppend publishes) —
    // the segment must drop out of scoring entirely, and the next replay
    // must restore it exactly
    val statsDir = new org.apache.hadoop.fs.Path(s"$path/stats")
    val fs = statsDir.getFileSystem(spark.sessionState.newHadoopConf())
    val tag1 = graft.util.BatchAppend.tag(1L)
    fs.listStatus(statsDir).map(_.getPath)
      .filter(_.getName.startsWith(s"$tag1-")).foreach(fs.delete(_, false))
    val twoSegs = java.nio.file.Files
      .createTempDirectory("graft-bm25-ingest-ref").toString
    Bm25.writeBm25Index(docs.filter($"doc_id" % 3 =!= 2), twoSegs)
    assert(Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq ==
      Bm25.queryBm25Index(spark, twoSegs, queries)
        .collect().map(_.toSeq).toSeq,
      "torn segment leaked into scoring")
    drive(docs.filter($"doc_id" % 3 === 2), 1L) // the replay completes it
    assert(Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq == batch)
  }

  test("ingest auto-compaction: ceiling crossed → postings rewritten in the maintenance slot, replayable batch carried, probes unchanged") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-bm25-autocompact").toString
    Bm25.writeBm25Index(docs.filter($"doc_id" % 5 === 0), path)
    val compactedAt = scala.collection.mutable.Buffer[Long]()
    // ceiling low enough that the fragmenting per-batch segment files
    // cross it: the build alone lands ~1 file per touched term bucket
    val limit = graft.util.Compaction
      .dataFileCount(spark, s"$path/postings") + 1L
    (1 to 4).foreach { r =>
      graft.streaming.LexStream.processBm25IngestBatch(
        docs.filter($"doc_id" % 5 === r), r.toLong - 1L, path,
        Some(limit)) { (rows, _) =>
        rows.as[(Long, Long, Long, Boolean)].collect()
          .filter(_._4).foreach(x => compactedAt += x._1)
      }
    }
    assert(compactedAt.nonEmpty, "fragmentation ceiling never fired")
    // the fence (batchId - 1) must have carried the COMPACTING batch's own
    // files verbatim — it is still replayable until its checkpoint commit
    val lastCompact = compactedAt.last
    val tag = graft.util.BatchAppend.tag(lastCompact)
    val postingsDir = new org.apache.hadoop.fs.Path(s"$path/postings")
    val fs = postingsDir.getFileSystem(spark.sessionState.newHadoopConf())
    def allFiles(p: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) allFiles(st.getPath)
        else Seq(st.getPath.getName)
      }
    assert(allFiles(postingsDir).exists(_.startsWith(s"$tag-")),
      s"batch $lastCompact's tagged files were compacted away while still replayable")
    // row preservation: the probe through the compacted layout equals the
    // batch scorer over the full corpus
    val queries = docs.filter($"doc_id" < 3)
      .select($"doc_id".as("query_id"), $"text")
    assert(Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq ==
      Bm25.bm25TopK(spark, sf).collect().map(_.toSeq).toSeq)
  }

  test("hybrid serving: micro-batch fusion ≡ batch hybrid_rrf_topk at full probe width") {
    import graft.operators.Similarity
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val lexPath = java.nio.file.Files
      .createTempDirectory("graft-hybrid-lex").toString
    val semPath = java.nio.file.Files
      .createTempDirectory("graft-hybrid-sem").toString
    Bm25.writeBm25Index(docs, lexPath)
    Similarity.writeIvfIndex(Similarity.buildIvfIndex(emb, nlist = 16),
      semPath)
    // the serving queries: the batch entry's own fixture queries — doc
    // texts 0..2 paired with embedding vectors 0..2
    val texts = docs.filter($"doc_id" < 3).as[(Long, String)].collect()
      .map { case (id, t) => id -> String.valueOf(t) }.toMap
    val vecs = emb.filter($"vec_id" < 3).as[(Long, Seq[Float])].collect()
      .toMap
    val queries = (0L to 2L).map(i => (i, texts(i), vecs(i)))
    val results = scala.collection.mutable
      .Set[(Long, Long, Long, Long, Long)]()
    val ms = MemoryStream[(Long, String, Seq[Float])]
    // nprobe = nlist: the probe covers every cell, so the semantic leg is
    // the exact cosine ranking and the fusion must be BIT-EQUAL to the
    // oracle-checked batch entry (at serving nprobe < nlist the semantic
    // leg is the documented approximation — same fusion, fewer candidates)
    val q = graft.streaming.LexStream.hybridSearchQuery(
      ms.toDF().toDF("query_id", "text", "embedding"),
      lexPath, semPath, nprobe = 16) { (topk, _) =>
      results ++= topk.as[(Long, Long, Long, Long, Long)].collect()
    }.start()
    try {
      // split delivery: the fusion is per-query, so batching must not matter
      ms.addData(queries.take(1): _*)
      q.processAllAvailable()
      ms.addData(queries.drop(1): _*)
      q.processAllAvailable()
      val batch = graft.operators.Bm25.hybridRrfTopK(spark, sf)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(results.toSet == batch,
        s"stream ${results.toSeq.sortBy(r => (r._1, r._2)).take(4)} vs " +
          s"batch ${batch.toSeq.sortBy(r => (r._1, r._2)).take(4)}")
      assert(results.nonEmpty)
    } finally q.stop()
  }

  test("hybrid serving through a RETRACTION: a doc deleted from BOTH legs mid-stream leaves the fused top-k at the next trigger") {
    import graft.operators.Similarity
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
      .filter($"embedding".isNotNull)
    val lexPath = java.nio.file.Files
      .createTempDirectory("graft-hyret-lex").toString
    val semPath = java.nio.file.Files
      .createTempDirectory("graft-hyret-sem").toString
    // reference twins: the never-appended corpus indexes
    val lexRefPath = java.nio.file.Files
      .createTempDirectory("graft-hyret-lexref").toString
    val semRefPath = java.nio.file.Files
      .createTempDirectory("graft-hyret-semref").toString
    Bm25.writeBm25Index(docs, lexPath)
    Bm25.writeBm25Index(docs, lexRefPath)
    Similarity.writeIvfIndex(Similarity.buildIvfIndex(emb, nlist = 16),
      semPath)
    Similarity.writeIvfIndex(Similarity.buildIvfIndex(emb, nlist = 16),
      semRefPath)
    val qText = String.valueOf(
      docs.filter($"doc_id" === 0L).head().getString(1))
    val qVec = emb.filter($"vec_id" === 0L)
      .as[(Long, Seq[Float])].head()._2
    // the retractable doc: EXACT text+embedding twin of query 0 under a
    // junk id — it must rank at the top of BOTH legs and therefore fuse
    val junkId = 9000001L
    Bm25.appendToBm25Index(
      Seq((junkId, qText)).toDF("doc_id", "text"), lexPath)
    Similarity.appendToIvfIndex(
      Seq((junkId, qVec)).toDF("vec_id", "embedding"), semPath)
    val perBatch = scala.collection.mutable
      .Map[Long, Set[(Long, Long, Long, Long, Long)]]()
    val ms = MemoryStream[(Long, String, Seq[Float])]
    // nprobe = nlist: both legs exact, so the post-delete trigger must be
    // BIT-EQUAL to the fused probe of the never-appended reference twins
    val q = graft.streaming.LexStream.hybridSearchQuery(
      ms.toDF().toDF("query_id", "text", "embedding"),
      lexPath, semPath, nprobe = 16) { (topk, bid) =>
      perBatch(bid) = topk.as[(Long, Long, Long, Long, Long)].collect().toSet
    }.start()
    try {
      ms.addData((0L, qText, qVec))
      q.processAllAvailable()
      assert(perBatch(0L).exists(_._3 == junkId),
        "fixture degenerate: the planted twin never fused into the top-k")
      // the takedown hits BOTH legs: lexical tombstone (with the (N, Σdl)
      // correction) and vector tombstone — no rewrite on either
      Bm25.deleteFromBm25Index(spark, lexPath,
        Seq(Tuple1(junkId)).toDF("doc_id"))
      Similarity.deleteFromIvfIndex(
        Seq(Tuple1(junkId)).toDF("vec_id"), semPath)
      ms.addData((0L, qText, qVec))
      q.processAllAvailable()
      assert(!perBatch(1L).exists(_._3 == junkId),
        "a doc deleted from both legs kept fusing into the served top-k")
      // and not merely absent: the post-delete fusion is bit-equal to the
      // never-appended reference (constants correction included — a
      // missed (N, Σdl) shift would change rrf_micros via the lex ranks)
      val qdf = Seq((0L, qText)).toDF("query_id", "text")
      val lexRef = Bm25.queryStandingBm25(
          Bm25.prepareBm25Index(spark, lexRefPath), qdf)
        .select($"query_id", $"doc_id", $"rk")
      val semRef = Similarity.queryStandingIvf(
          Similarity.prepareIvfIndex(spark, semRefPath),
          Seq((0L, qVec)).toDF("vec_id", "embedding"), nprobe = 16)
        .select($"query_id", $"vec_id".as("doc_id"), $"rk")
      val want = Bm25.rrfFuse(lexRef, semRef, 10, 60)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(perBatch(1L) == want,
        s"post-retraction fusion ${perBatch(1L).toSeq.sortBy(_._2).take(4)}" +
          s" vs reference ${want.toSeq.sortBy(_._2).take(4)}")
    } finally q.stop()
  }

  test("tombstone pressure: a DELETES-ONLY ingest stream fires the full absorb+fold below the fragmentation ceiling; probes stay bit-equal and the medium retires") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .filter($"doc_id" < 60)
    val path = java.nio.file.Files
      .createTempDirectory("graft-bm25-tspressure").toString
    Bm25.writeBm25Index(docs, path)
    val dead = Seq(5L, 7L, 11L)
    // three separate takedowns: three live tombstone files — past bound 2
    dead.foreach { id =>
      Bm25.deleteFromBm25Index(spark, path,
        spark.createDataFrame(Seq(Tuple1(id))).toDF("doc_id"))
    }
    val queries = docs.filter($"doc_id" < 3)
      .select($"doc_id".as("query_id"), $"text")
    val want = Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq
    val rows = scala.collection.mutable.Buffer[(Long, Long, Long, Boolean)]()
    // the stream carries NO documents — only the maintenance slot runs;
    // NO fragmentation ceiling is configured, the pressure bound alone
    // must fire. Fence = batchId - 1 = 0: every pre-existing file is
    // eligible, so the absorb is carry-free and the correction FOLDS.
    graft.streaming.LexStream.processBm25IngestBatch(
      docs.filter($"doc_id" < 0), 1L, path, None,
      autoCompactMaxTombstones = Some(2L)) { (r, _) =>
      rows ++= r.as[(Long, Long, Long, Boolean)].collect()
    }
    assert(rows.map(r => (r._1, r._4)) == Seq((1L, true)),
      s"pressure slot must report the absorb: $rows")
    assert(Bm25.liveTombstoneFileCount(spark, path) == 0,
      "carry-free absorb must fold and retire the live tombstones")
    assert(spark.read.parquet(s"$path/postings")
      .filter($"doc_id".isin(dead: _*)).count() == 0L,
      "absorb must drop the retracted postings physically")
    // scoring unchanged across the fold (correction now in tsfold), and
    // equal to a fresh index over the retained corpus
    assert(Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq == want)
    val refPath = java.nio.file.Files
      .createTempDirectory("graft-bm25-tspressure-ref").toString
    Bm25.writeBm25Index(docs.filter(!$"doc_id".isin(dead: _*)), refPath)
    assert(Bm25.queryBm25Index(spark, refPath, queries)
      .collect().map(_.toSeq).toSeq == want)
    // no pressure left: the next deletes-only slot is quiet
    graft.streaming.LexStream.processBm25IngestBatch(
      docs.filter($"doc_id" < 0), 2L, path, None,
      autoCompactMaxTombstones = Some(2L)) { (r, _) =>
      rows ++= r.as[(Long, Long, Long, Boolean)].collect()
    }
    assert(rows.last == ((2L, 0L, 0L, false)))
  }
}
