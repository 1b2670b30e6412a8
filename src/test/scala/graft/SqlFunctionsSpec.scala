package graft

import org.apache.spark.sql.functions.{array_intersect, size}

import graft.functions.TextExpressions
import graft.operators.Dedup

/** GraftExtensions SQL registration + native set-op expression: the custom
  * expressions are reachable from `spark.sql`, and agree with both the
  * DataFrame API path and the built-ins they replace.
  */
class SqlFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("graft expressions callable from SQL via GraftExtensions") {
    val cos = spark.sql(
      "SELECT cosine_sim(array(float(1.0), float(0.0)), array(float(1.0), float(0.0)))")
      .head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)

    val sh = spark.sql("SELECT char_shingles('abcd', 3)").head.getSeq[String](0)
    assert(sh == Seq("abc", "bcd"))

    val bands = spark.sql("SELECT minhash_bands('hello world hello', 5, 4, 2)")
      .head.getSeq[Long](0)
    assert(bands.length == 4)

    assert(spark.sql("SELECT simhash64('hello world again', 5)").head.getLong(0) != 0L)

    val fp = spark.sql("SELECT min_md5_shingles('abcdefghij', 8)").head.getString(0)
    assert(fp.length == 32 && fp.forall(c => c.isDigit || ('a' to 'f').contains(c)))

    val grams = spark.sql("SELECT token_ngrams('a b c d', 3)").head.getSeq[String](0)
    assert(grams == Seq("a b c", "b c d"))

    // SQL and DataFrame paths resolve to the same expression
    val viaDf = Seq("abcd").toDF("t")
      .select(Dedup.charShingles($"t", 3)).head.getSeq[String](0)
    assert(viaDf == sh)
  }

  test("redact_pii / shard_of / hash_gate SQL forms match the operator API") {
    import graft.operators.Sampling
    val red = spark.sql(
      "SELECT redact_pii('mail a@b.co or 555-1234 at 1.2.3.4')").head.getString(0)
    assert(red == "mail <EMAIL> or <PHONE> at <IP>")
    val ids = (0L until 200L).toDF("id")
    ids.createOrReplaceTempView("ids_tmp")
    val viaSql = spark.sql("SELECT id, shard_of(id, 16) AS s FROM ids_tmp")
      .as[(Long, Long)].collect().toMap
    val viaApi = ids.select($"id", Sampling.shardOf($"id", 16).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(viaSql == viaApi)
    val gateSql = spark.sql("SELECT id FROM ids_tmp WHERE hash_gate(id, 0.25)")
      .as[Long].collect().toSet
    val gateApi = ids.filter(Sampling.hashGate($"id", 0.25))
      .as[Long].collect().toSet
    assert(gateSql == gateApi)
  }

  test("ngram_jaccard: identity 1.0, disjoint 0.0, short/null → NULL, matches set-op form") {
    assert(spark.sql("SELECT ngram_jaccard('abcdef', 'abcdef', 3)").head.getDouble(0) == 1.0)
    assert(spark.sql("SELECT ngram_jaccard('aaaa', 'bbbb', 3)").head.getDouble(0) == 0.0)
    assert(spark.sql("SELECT ngram_jaccard('ab', 'abcdef', 3)").head.isNullAt(0))
    assert(spark.sql("SELECT ngram_jaccard(NULL, 'abcdef', 3)").head.isNullAt(0))
    // fused expression equals the compositional set-op form
    val (a, b) = ("the quick brown fox", "the quick brown dog")
    val fused = spark.sql(s"SELECT ngram_jaccard('$a', '$b', 4)").head.getDouble(0)
    val viaSets = Seq((a, b)).toDF("a", "b")
      .select((size(array_intersect(TextExpressions.charShingles($"a", 4),
        TextExpressions.charShingles($"b", 4))).cast("double") /
        size(org.apache.spark.sql.functions.array_union(
          TextExpressions.charShingles($"a", 4),
          TextExpressions.charShingles($"b", 4)))))
      .head.getDouble(0)
    assert(math.abs(fused - viaSets) < 1e-12)
  }

  test("non-literal geometry argument is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT char_shingles('abc', 1 + 2)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("setIntersectSize agrees with size(array_intersect) on distinct sets") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("x")),
      (Seq.empty[String], Seq("x")),
      (Seq("p", "q"), Seq.empty[String]))
      .toDF("a", "b")
    df.select(
      TextExpressions.setIntersectSize($"a", $"b").as("native"),
      size(array_intersect($"a", $"b")).as("builtin"))
      .as[(Int, Int)].collect()
      .foreach { case (n, m) => assert(n == m) }
  }

  // ------------------------------------------------------------------
  // TABLE-VALUED surface over the standing-index read paths: every
  // graft_* TVF must return EXACTLY the Scala entry's rows (the builder
  // returns the same analyzed plan — these pin that nothing in the SQL
  // arg plumbing diverges). The `ivf_topk_sql` registered entry
  // hash-checks the IVF one against the DuckDB oracle besides.
  // ------------------------------------------------------------------

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).sortBy(_.toString).toSeq

  private def emb = graft.util.Cols.spread(
      graft.sources.Tables.embeddings(spark, sf))
    .select($"vec_id", $"embedding")

  test("graft_ivf_topk / graft_pq_topk / graft_ivf_pq_topk serve the Scala standing probes from SQL") {
    import graft.operators.{Pq, Similarity}
    val queries = emb.filter($"vec_id" < 4)
    queries.createOrReplaceTempView("tvf_q_vec")

    val ivf = tmp("graft-tvf-ivf")
    // nlist=32: the auto coarse tier engages — the SQL path must serve
    // the same two-level choice the Scala path does
    Similarity.writeIvfIndex(Similarity.buildIvfIndex(emb, nlist = 32), ivf)
    assert(rows(spark.sql(
        s"SELECT * FROM graft_ivf_topk('$ivf', 'tvf_q_vec', 10, 4)")) ==
      rows(Similarity.queryStandingIvf(
        Similarity.prepareIvfIndex(spark, ivf), queries)))
    // explicit wCoarse arg threads through
    assert(rows(spark.sql(
        s"SELECT * FROM graft_ivf_topk('$ivf', 'tvf_q_vec', 10, 4, 6)")) ==
      rows(Similarity.queryStandingIvf(
        Similarity.prepareIvfIndex(spark, ivf), queries, wCoarse = 6)))

    val model = Pq.train(emb)
    val pq = tmp("graft-tvf-pq")
    Pq.writePqIndex(emb, model, pq)
    assert(rows(spark.sql(
        s"SELECT * FROM graft_pq_topk('$pq', 'tvf_q_vec', 10)")) ==
      rows(Pq.queryStandingPq(Pq.preparePqIndex(spark, pq), queries)))

    val index = Similarity.buildIvfIndex(emb, nlist = 16)
    val ivfpq = tmp("graft-tvf-ivfpq")
    Pq.writeIvfPqIndex(index.bucketed, model, index.centers, ivfpq,
      ncoarse = 4)
    assert(rows(spark.sql(
        s"SELECT * FROM graft_ivf_pq_topk('$ivfpq', 'tvf_q_vec', 10, 4)")) ==
      rows(Pq.queryStandingIvfPq(Pq.prepareIvfPqIndex(spark, ivfpq),
        queries)))
  }

  test("graft_bm25_topk and graft_hybrid_rrf_topk serve the lexical and fused standing probes from SQL") {
    import graft.operators.{Bm25, Similarity}
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val bm25 = tmp("graft-tvf-bm25")
    Bm25.writeBm25Index(docs, bm25)
    val qtext = docs.filter($"doc_id" < 3)
      .select($"doc_id".as("query_id"), $"text")
    qtext.createOrReplaceTempView("tvf_q_text")
    assert(rows(spark.sql(
        s"SELECT * FROM graft_bm25_topk('$bm25', 'tvf_q_text', 10)")) ==
      rows(Bm25.queryBm25Index(spark, bm25, qtext)))

    val ivf = tmp("graft-tvf-hybrid-ivf")
    Similarity.writeIvfIndex(Similarity.buildIvfIndex(emb, nlist = 16), ivf)
    // hybrid queries carry BOTH modalities, doc-aligned ids
    val qboth = qtext.join(
      emb.select($"vec_id".as("query_id"), $"embedding"), Seq("query_id"))
    qboth.createOrReplaceTempView("tvf_q_both")
    val lex = Bm25.queryBm25Index(spark, bm25,
        qboth.select($"query_id", $"text"), 10)
      .select($"query_id", $"doc_id", $"rk")
    val sem = Similarity.queryStandingIvf(
        Similarity.prepareIvfIndex(spark, ivf),
        qboth.select($"query_id".as("vec_id"), $"embedding"), 10)
      .select($"query_id", $"vec_id".as("doc_id"), $"rk")
    assert(rows(spark.sql("SELECT * FROM graft_hybrid_rrf_topk(" +
        s"'$bm25', '$ivf', 'tvf_q_both', 10, 60)")) ==
      rows(Bm25.rrfFuse(lex, sem, 10, 60)))
  }

  test("graft_near_dup_probe serves the standing band-index probe from SQL") {
    import graft.operators.Dedup
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val corpus = docs.filter($"doc_id" % 4 =!= 3)
    val batch = docs.filter($"doc_id" % 4 === 3)
    Dedup.writeBandIndex(corpus, "tvf_band_idx", buckets = 4)
    corpus.createOrReplaceTempView("tvf_corpus")
    batch.createOrReplaceTempView("tvf_batch")
    assert(rows(spark.sql("SELECT * FROM graft_near_dup_probe(" +
        "'tvf_band_idx', 'tvf_corpus', 'tvf_batch', 0.8)")) ==
      rows(Dedup.incrementalNearDupIndexed(corpus, "tvf_band_idx", batch)))
  }
}
