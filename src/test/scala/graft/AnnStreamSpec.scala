package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Similarity
import graft.sources.Tables
import graft.streaming.AnnStream

/** Streaming IVF serving: micro-batch probes of the persisted index must
  * union to the one-shot batch probe, and observe concurrent appends. */
class AnnStreamSpec extends SparkTestBase {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("micro-batch probes equal the batch probe; appended vectors become searchable") {
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ann-stream").toString
    Similarity.writeIvfIndex(Similarity.buildIvfIndex(corpus), path)
    val queries = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toSeq.sortBy(_._1).take(6)
    val results = scala.collection.mutable.Set[(Long, Long, Double, Long)]()
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = AnnStream.ivfSearchQuery(
      ms.toDF().toDF("vec_id", "embedding"), path) { (topk, _) =>
      results ++= topk.as[(Long, Long, Double, Long)].collect()
    }.start()
    try {
      val (first, second) = queries.splitAt(3)
      ms.addData(first: _*)
      q.processAllAvailable()
      ms.addData(second: _*)
      q.processAllAvailable()
      // per-query results depend only on (query, index): batch-split union
      // equals the one-shot probe of the same loaded index
      val expected = Similarity.queryIvfIndex(
        Similarity.loadIvfIndex(spark, path), queries)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(results.toSet == expected)
      assert(results.nonEmpty)
      // probe-while-ingest: append a vector near query 0's embedding, the
      // next micro-batch must surface it
      val (qid, qemb) = queries.head
      Similarity.appendToIvfIndex(
        Seq((990000L, qemb)).toDF("vec_id", "embedding"), path)
      results.clear()
      ms.addData((qid, qemb))
      q.processAllAvailable()
      assert(results.exists(_._2 == 990000L),
        s"appended vector not surfaced: ${results.toSeq.sortBy(_._4).take(3)}")
    } finally q.stop()
  }

  test("serving over a COARSE-TIER index: stream ≡ batch standing probe; a retrain refits the coarse medium and the next trigger serves it") {
    val emb = Tables.embeddings(spark, sf).filter($"embedding".isNotNull)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ann-coarse-stream").toString
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb.filter($"vec_id" % 2 === 0)), path,
      ncoarse = 4)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toSeq
    val results = scala.collection.mutable.Set[(Long, Long, Double, Long)]()
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = AnnStream.ivfSearchQuery(
      ms.toDF().toDF("vec_id", "embedding"), path) { (topk, _) =>
      results ++= topk.as[(Long, Long, Double, Long)].collect()
    }.start()
    try {
      ms.addData(queries: _*)
      q.processAllAvailable()
      // the stream served through the persisted two-level choice — must
      // equal the batch standing probe of the same index (which
      // SimilaritySpec pins against the driver-side coarse ranking)
      val qdf = queries.toDF("vec_id", "embedding")
      val expected = Similarity.queryStandingIvf(
        Similarity.prepareIvfIndex(spark, path), qdf)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(results.toSet == expected)
      assert(results.nonEmpty)
      // retrain: new centers AND a refit coarse medium swap together; the
      // signature (which covers the coarse medium) re-prepares the handle
      Similarity.appendToIvfIndex(
        emb.filter($"vec_id" % 2 === 1), path)
      Similarity.retrainIvfIndex(spark, path)
      results.clear()
      ms.addData(queries: _*)
      q.processAllAvailable()
      val post = Similarity.prepareIvfIndex(spark, path)
      assert(post.coarse.isDefined)
      val expectedPost = Similarity.queryStandingIvf(post, qdf)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(results.toSet == expectedPost,
        "post-retrain trigger must serve the refit coarse geometry")
    } finally q.stop()
  }

  test("serving survives a retrain: the next trigger probes the swapped geometry") {
    val emb = Tables.embeddings(spark, sf)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ann-retrain-stream").toString
    // build on half the corpus so the later retrain (over the grown
    // corpus) produces materially different centers
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb.filter($"vec_id" % 2 === 0)), path)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toSeq
    val results = scala.collection.mutable.Set[(Long, Long, Double, Long)]()
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = AnnStream.ivfSearchQuery(
      ms.toDF().toDF("vec_id", "embedding"), path) { (topk, _) =>
      results ++= topk.as[(Long, Long, Double, Long)].collect()
    }.start()
    try {
      ms.addData(queries.head)
      q.processAllAvailable() // handle is now warm on the OLD geometry
      // grow the corpus, then retrain + swap while the stream is up
      Similarity.appendToIvfIndex(
        emb.filter($"vec_id" % 2 === 1).select($"vec_id", $"embedding"), path)
      Similarity.retrainIvfIndex(spark, path)
      results.clear()
      ms.addData(queries: _*)
      q.processAllAvailable()
      // the trigger after the swap must agree with the batch probe of the
      // RETRAINED index — the stream re-prepared its handle by itself
      val expected = Similarity.queryIvfIndex(
        Similarity.loadIvfIndex(spark, path), queries)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(results.toSet == expected)
      assert(results.nonEmpty)
    } finally q.stop()
  }

  test("IVF×PQ serving: micro-batch probes equal the batch ivf_pq_topk composition; an index refresh is picked up") {
    import graft.operators.Pq
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    // the SAME artifacts the ivf_pq_topk entry composes in memory: the
    // process-wide standing coarse fit and the deterministic fixture
    // codebooks (Pq.train is seeded + sample-gated — PqSpec pins identical
    // retrains), persisted in the serving layout
    val model = Pq.train(emb)
    val index = Similarity.standingIndex(spark, sf, nlist = 16)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-stream").toString
    Pq.writeIvfPqIndex(index.bucketed, model, index.centers, path)
    val queries = emb.filter($"vec_id" < 5)
      .as[(Long, Seq[Float])].collect().toSeq
    val results = scala.collection.mutable.Set[(Long, Long, Double, Long)]()
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = AnnStream.ivfPqSearchQuery(
      ms.toDF().toDF("vec_id", "embedding"), path) { (topk, _) =>
      results ++= topk.as[(Long, Long, Double, Long)].collect()
    }.start()
    try {
      // split delivery must union to the one-shot BATCH composition —
      // the registered ivf_pq_topk entry itself, not a re-derivation
      val (first, second) = queries.splitAt(2)
      ms.addData(first: _*)
      q.processAllAvailable()
      ms.addData(second: _*)
      q.processAllAvailable()
      val expected = Pq.ivfPqTopK(spark, sf)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(results.toSet == expected)
      assert(results.nonEmpty)
      // codebook retrain swapped under the live stream: the combined
      // signature changes, the handle re-prepares, and the next trigger
      // equals a freshly prepared batch probe of the refreshed index
      Pq.writeIvfPqIndex(index.bucketed, Pq.train(emb, seed = 1043L),
        index.centers, path)
      results.clear()
      ms.addData(queries: _*)
      q.processAllAvailable()
      val fresh = Pq.queryStandingIvfPq(
        Pq.prepareIvfPqIndex(spark, path),
        queries.toDF("vec_id", "embedding"))
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(results.toSet == fresh)
      assert(results.nonEmpty)
    } finally q.stop()
  }

  test("residual IVF×PQ serving: micro-batch probes equal the registered residual composition; a retrain refresh is picked up") {
    import graft.operators.Pq
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    // the SAME artifacts the ivf_pq_residual_topk entry composes in
    // memory: the process-wide standing coarse fit and the deterministic
    // residual codebook fit, persisted in the residual serving layout
    val index = Similarity.standingIndex(spark, sf, nlist = 16)
    val rmodel = Pq.trainResidual(index)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-res-stream").toString
    Pq.writeIvfPqResidualIndex(index, rmodel, path)
    val queries = emb.filter($"vec_id" < 5)
      .as[(Long, Seq[Float])].collect().toSeq
    val results = scala.collection.mutable.Set[(Long, Long, Double, Long)]()
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = AnnStream.ivfPqResidualSearchQuery(
      ms.toDF().toDF("vec_id", "embedding"), path) { (topk, _) =>
      results ++= topk.as[(Long, Long, Double, Long)].collect()
    }.start()
    try {
      // split delivery must union to the REGISTERED batch entry — the
      // broadcast-join path — so fold ≡ join is pinned here in-process
      // on top of the oracle's DuckDB replay of the fold-backed entry
      val (first, second) = queries.splitAt(2)
      ms.addData(first: _*)
      q.processAllAvailable()
      ms.addData(second: _*)
      q.processAllAvailable()
      val expected = Pq.ivfPqResidualTopK(spark, sf)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(results.toSet == expected)
      assert(results.nonEmpty)
      // residual retrain swapped under the live stream: new codebooks
      // (different seed) over the SAME coarse fit — the combined
      // signature changes and the next trigger equals a freshly
      // prepared batch probe of the refreshed index
      Pq.writeIvfPqResidualIndex(index,
        Pq.trainResidual(index, seed = 1043L), path)
      results.clear()
      ms.addData(queries: _*)
      q.processAllAvailable()
      val fresh = Pq.queryStandingIvfPqResidual(
        Pq.prepareIvfPqIndex(spark, path),
        queries.toDF("vec_id", "embedding"))
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(results.toSet == fresh)
      assert(results.nonEmpty)
    } finally q.stop()
  }

  test("PQ serving: micro-batch ADC probes equal the batch ADC top-k; appends and codebook refreshes visible") {
    import graft.operators.Pq
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-pq-stream").toString
    Pq.writePqIndex(corpus, Pq.train(corpus), path)
    val queries = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toSeq.sortBy(_._1).take(6)
    def batchTopK(qs: Seq[(Long, Seq[Float])]) = {
      val model = Pq.loadPqModel(spark, path)
      Pq.adcTopK(spark.read.parquet(s"$path/codes"), model, qs)
        .as[(Long, Long, Double, Long)].collect().toSet
    }
    val results = scala.collection.mutable.Set[(Long, Long, Double, Long)]()
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = AnnStream.pqSearchQuery(
      ms.toDF().toDF("vec_id", "embedding"), path) { (topk, _) =>
      results ++= topk.as[(Long, Long, Double, Long)].collect()
    }.start()
    try {
      // split delivery must union to the one-shot batch ADC ranking —
      // in-plan dtabs ≡ driver dtabs, aggregate rank ≡ salted window rank
      val (first, second) = queries.splitAt(3)
      ms.addData(first: _*)
      q.processAllAvailable()
      ms.addData(second: _*)
      q.processAllAvailable()
      assert(results.toSet == batchTopK(queries))
      assert(results.nonEmpty)
      // frozen-codebook append: a vector encoded to the query's own codes
      // has ADC distance 0 — the next micro-batch must surface it first
      val (qid, qemb) = queries.head
      Pq.appendToPqIndex(Seq((990000L, qemb)).toDF("vec_id", "embedding"),
        path)
      results.clear()
      ms.addData((qid, qemb))
      q.processAllAvailable()
      assert(results.exists(r => r._2 == 990000L && r._4 == 1L),
        s"appended vector not surfaced first: ${results.toSeq.sortBy(_._4).take(3)}")
      // codebook REFRESH under the live stream (a retrain: new seed, new
      // codewords, re-encoded corpus): the signature check re-prepares the
      // handle and the next trigger must equal the batch ranking of the
      // refreshed index
      Pq.writePqIndex(corpus, Pq.train(corpus, seed = 1043L), path)
      results.clear()
      ms.addData(queries: _*)
      q.processAllAvailable()
      assert(results.toSet == batchTopK(queries))
      assert(results.nonEmpty)
    } finally q.stop()
  }
}
