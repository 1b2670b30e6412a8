package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols._

/** BM25 lexical retrieval (builder-brief extension; no reference
  * analogue) — the term-based tier next to the embedding family: the
  * first `numQueries` documents act as queries against the corpus, scored
  * with Okapi BM25 at the standard (k1 = 1.2, b = 0.75) operating point.
  *
  * Engine-exact scoring, the same discipline as the LM/DSIR family: with
  * k1 = 6/5 and b = 3/4, the tf saturation term is a ratio of exact
  * integers —
  *   tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)
  *     = 22·tf·L / (10·tf·L + 3·L + 9·dl·N)      (L = Σ dl, avgdl = L/N)
  * — so the only libm call is ln() inside idf, quantized to integer
  * micros PER TERM (vocabulary-sized, not corpus-sized, exposure); each
  * per-(doc, term) weight is then round(idf_micros·num/den), a fixed
  * double dag that both engines evaluate bit-identically, and per-doc
  * scores are exact BIGINT sums of those. The num/den terms are widened
  * to DOUBLE before any multiplication (22·tf·L etc. as ((22·tf)·L) in
  * IEEE double, the identical left-associated dag in the DuckDB oracle):
  * the previous Int64 products wrapped silently in Spark past
  * tf·Σdl ≳ 9·10¹⁷ — reachable at the 100 TB corpus scale this engine
  * targets — while DuckDB raised, so the engines diverged exactly at
  * scale. In double both engines compute the same (possibly IEEE-rounded
  * past 2⁵³, but identically rounded) value at any corpus size.
  */
object Bm25 {

  /** The one BM25 per-(doc, term) weight dag, shared by the batch scorer
    * and the standing-index probe so the arithmetic cannot fork. All
    * integer inputs widen to double BEFORE multiplication (see the object
    * doc); the fold order matches the generated oracle SQL exactly. */
  private def weightMicros(idfMicros: Column, tf: Column, dl: Column,
      nDocs: Long, totalDl: Long): Column = {
    val num = lit(22.0) * tf.cast("double") * lit(totalDl.toDouble)
    val den = lit(10.0) * tf.cast("double") * lit(totalDl.toDouble) +
      lit(3.0 * totalDl) + lit(9.0 * nDocs) * dl.cast("double")
    round(idfMicros * num / den).cast("long")
  }

  def bm25TopK(spark: SparkSession, sfDir: String, numQueries: Int = 3,
      k: Int = 10, salts: Int = 8): DataFrame = {
    val docs = spread(Tables.documents(spark, sfDir))
      .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
    val lens = docs.select($"doc_id", size($"toks").cast("long").as("dl"))
    // corpus stats pass (N, Σdl): the standard two-pass BM25 shape — ONE
    // bounded 1-row collect, then the constants fold into the scoring
    // expressions (a 1-row frame joined in would either cross-join (BNLJ,
    // the audit's target) or need a literal-key join Catalyst folds back
    // into one)
    val statsRow = lens.agg(
      count(lit(1)).as("n_docs"), sum($"dl").as("total_dl")).head()
    val nDocs = statsRow.getLong(0)
    val totalDl = statsRow.getLong(1)
    val exploded = docs.select($"doc_id", explode($"toks").as("term"))
    val qterms = exploded.filter($"doc_id" < numQueries).distinct()
      .select($"doc_id".as("query_id"), $"term")
    val qvocab = broadcast(qterms.select($"term").distinct())
    // inverted-index slice: only query-term postings survive the explode
    val postings = exploded.join(qvocab, "term")
    val dfTab = postings.distinct()
      .groupBy($"term").agg(count(lit(1)).as("df"))
    val idf = broadcast(dfTab
      .select($"term", round(
        log((lit(nDocs) - $"df" + 0.5) / ($"df" + 0.5) + 1.0) * 1e6)
        .cast("long").as("idf_micros")))
    val tf = postings.groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"))
    val weights = tf
      .join(lens, "doc_id")
      .join(idf, "term")
      .select($"doc_id", $"term",
        weightMicros($"idf_micros", $"tf", $"dl", nDocs, totalDl).as("wm"))
    val scored = weights.join(qterms, "term")
      .filter($"doc_id" =!= $"query_id")
      .groupBy($"query_id", $"doc_id")
      .agg(sum($"wm").as("score_micros"))
      .select($"query_id", $"doc_id".as("vec_id"), $"score_micros")
    Similarity.topKPerQuery(scored, k, salts, "score_micros", asc = false)
      .select($"query_id", $"rk", $"vec_id".as("doc_id"), $"score_micros")
      .orderBy($"query_id", $"rk")
  }

  // ------------------------------------------------------------------
  // Standing lexical index — write / append / probe, the same
  // build-once/query-many contract as the vector tiers (IVF, PQ, SQ8).
  // Layout (the Lucene segment shape re-expressed as a lake layout):
  //   postings/ : (term, doc_id, tf, dl, seg) partitioned by
  //               tb = pmod(xxhash64(term), TermBuckets) — a query's term
  //               set maps to a handful of tb directories, so the probe
  //               prunes at FILE LISTING exactly like the IVF cell probe
  //               (query terms play the role of probed cells). dl is
  //               DENORMALIZED into the posting row (+8 bytes/posting)
  //               to kill the probe-time doc-length join outright — the
  //               classic space-for-shuffle trade, and the right one at
  //               100 TB where the join would re-shuffle pruned postings
  //               on doc_id against a corpus-sized lengths table.
  //   stats/    : ONE (seg, n_docs, total_dl) row PER SEGMENT (build +
  //               each append) — the probe folds the segment rows
  //               (segment-count-sized, driver-trivial) into exact corpus
  //               N and Σdl, so appends never rewrite global state.
  //
  // SEGMENT COMMIT: the stats row IS a segment's commit record. Every
  // posting row carries its segment id, postings write BEFORE stats, and
  // the probe scores only postings whose segment has a stats row — so a
  // crash between the two write jobs leaves an UNCOMMITTED segment whose
  // postings are invisible (filtered out) instead of permanently visible
  // postings scored with wrong (N, Σdl). A torn append is therefore
  // atomic-by-filter: either the whole segment counts or none of it does.
  // The committed-segment set is segment-count-sized (the same bound the
  // stats fold already has).
  //
  // df is NOT stored: (term, doc_id) is unique by the append contract
  // (new doc_ids only — the appendToPqIndex contract), so per-term df is
  // a count over the PRUNED postings slice the probe already reads — and
  // the probe now ENFORCES the contract (count vs distinct doc_id per
  // term in the same aggregate), so a violating append fails loudly at
  // the first probe instead of silently double-counting df and N.
  // Result: probes after any number of appends are BIT-EQUAL to a batch
  // bm25TopK over the union corpus — bm25_topk_indexed shares
  // bm25_topk's oracle, making the index layout + probe path itself
  // DuckDB-replayed.
  // ------------------------------------------------------------------

  /** Term-hash partition fan-out of the postings layout. 64 keeps fixture
    * directory counts sane; production sizes it so a bucket's postings
    * approximate one HDFS block per segment. */
  val TermBuckets = 64

  /** (term, doc_id, tf, dl, seg, tb) postings of a TOKENIZED corpus slice
    * (doc_id, toks) — tf grouped per (doc, term), dl denormalized onto
    * every posting, the owning segment id on every row (the commit-filter
    * key — see the layout doc above). */
  private def postingsOf(toks: DataFrame, seg: String): DataFrame =
    toks
      .select($"doc_id", size($"toks").cast("long").as("dl"),
        explode($"toks").as("term"))
      .groupBy($"term", $"doc_id", $"dl")
      .agg(count(lit(1)).as("tf"))
      .select($"term", $"doc_id", $"tf", $"dl", lit(seg).as("seg"),
        pmod(xxhash64($"term"), lit(TermBuckets.toLong)).as("tb"))

  /** One segment-stats row for a TOKENIZED corpus slice: zero-length docs
    * carry no postings but MUST count into N and Σdl (batch parity —
    * bm25TopK's lens frame sees every doc). */
  private def segmentStats(toks: DataFrame, seg: String): DataFrame =
    toks.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(size($"toks").cast("long")), lit(0L)).as("total_dl"))
      .select(lit(seg).as("seg"), $"n_docs", $"total_dl")

  /** Tokenize ONCE and persist across the two segment writes (postings +
    * stats are separate write ACTIONS — without the persist each would
    * re-scan and re-tokenize the source slice). Postings land FIRST, the
    * stats row second: the stats row is the segment's COMMIT record, so a
    * crash between the two jobs leaves an invisible (uncommitted) segment,
    * never visible postings with missing stats. */
  private def writeSegment(docs: DataFrame, path: String, seg: String,
      mode: String): Unit = {
    val toks = docs
      .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
      .persist()
    try {
      postingsOf(toks, seg).write.mode(mode).partitionBy("tb")
        .parquet(s"$path/postings")
      segmentStats(toks, seg).coalesce(1).write.mode(mode)
        .parquet(s"$path/stats")
    } finally { val _ = toks.unpersist() }
  }

  /** Persist a BM25 index for build-once / query-many use. */
  def writeBm25Index(docs: DataFrame, path: String): Unit =
    writeSegment(docs, path, seg = "base", mode = "overwrite")

  /** Append NEW documents (fresh doc_ids — the add-after-build contract
    * of every standing index here) as one more segment: postings land in
    * their term-bucket directories, one stats row COMMITS the segment's
    * (n_docs, Σdl). Only the batch-sized new slice is ever scanned or
    * shuffled; global stats are never rewritten, they fold at probe. A
    * crash mid-append leaves an uncommitted segment the probe ignores
    * (see the layout doc); re-appending existing doc_ids is caught at the
    * next probe's df-uniqueness guard. */
  def appendToBm25Index(newDocs: DataFrame, path: String): Unit =
    writeSegment(newDocs, path,
      seg = java.util.UUID.randomUUID().toString, mode = "append")

  /** The STREAMING ingest form of [[appendToBm25Index]] — one segment per
    * micro-batch, published through [[graft.util.BatchAppend]]'s
    * stage → clean → publish protocol under the batch tag for BOTH media
    * (postings into their tb directories, the stats commit row into
    * stats/), with seg = batchTag. A replayed batch id (foreachBatch's
    * at-least-once) therefore re-publishes the SAME segment instead of
    * double-counting: the clean step removes the dead attempt's files in
    * both directories before the staged ones rename in. Postings publish
    * first; a crash between the two publishes leaves the segment
    * uncommitted (invisible) until the replay completes it.
    *
    * Returns the committed segment's (n_docs, Σdl) — the ingest loop's
    * per-batch audit row, read off the stats aggregate the append computes
    * anyway. */
  def appendSegmentTagged(newDocs: DataFrame, path: String,
      batchTag: String): (Long, Long) = {
    val spark = newDocs.sparkSession
    val toks = newDocs
      .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
      .persist()
    try {
      graft.util.BatchAppend.append(postingsOf(toks, batchTag),
        s"$path/postings", batchTag, partitionCol = Some("tb"))
      val st = segmentStats(toks, batchTag).head()
      graft.util.BatchAppend.append(
        spark.createDataFrame(Seq((batchTag, st.getLong(1), st.getLong(2))))
          .toDF("seg", "n_docs", "total_dl"),
        s"$path/stats", batchTag)
      (st.getLong(1), st.getLong(2))
    } finally { val _ = toks.unpersist() }
  }

  /** A PREPARED standing handle on a persisted BM25 index — the lexical
    * twin of [[Pq.StandingPq]]: postings schema, the folded corpus
    * constants (N, Σdl), and the COMMITTED segment set are resolved ONCE;
    * each probe then re-lists only the postings directory (appends land
    * as new files in their term buckets and stay visible). `statsSig` is
    * the change signature: every append adds a stats file and a rebuild
    * rewrites the directory, so a serving loop that re-prepares on
    * signature change always scores with the constants — and the
    * committed-segment filter — that match the postings it reads. */
  final case class StandingBm25(spark: SparkSession, path: String,
      postingsSchema: org.apache.spark.sql.types.StructType,
      nDocs: Long, totalDl: Long, committedSegs: Seq[String],
      statsSig: Seq[(String, Long, Long)])

  /** Cheap change signature of the index's STATS directory PLUS its
    * tombstone directory — (name, length, mtime) per file, two listings.
    * Appends add a stats file, rebuilds rewrite the directory, and a
    * DELETE adds a tombstone file ((N, Σdl) change in all three cases —
    * the serving loop's currency check must fire for each); tombstone
    * entries are name-prefixed so the two directories cannot alias. */
  private[graft] def statsSignature(spark: SparkSession,
      path: String): Seq[(String, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/stats")
    val own = p.getFileSystem(spark.sessionState.newHadoopConf())
      .listStatus(p)
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_._1).toSeq
    own ++ graft.util.Tombstones.signature(spark, path)
      .map { case (n, l, t) => (s"ts:$n", l, t) }
  }

  /** DELETE documents from a standing BM25 index — the lexical retraction
    * contract ([[graft.util.Tombstones]]): tombstone rows carry
    * (doc_id, dl) because BM25's global constants must shrink with the
    * deletion — N by one per doc, Σdl by the doc's length — and no
    * postings rewrite can express that (stats rows are per-segment
    * aggregates). dl is looked up from the doc's own postings at DELETE
    * time (one postings scan — delete-time cost, not probe-time; a
    * zero-length doc has no postings and records dl = 0). Probes then
    * fold the tombstones twice over: the candidate anti-join and the
    * (N, Σdl) correction, both from the same directory — results are
    * bit-equal to a batch scorer over the retained corpus (the
    * `bm25_topk_deleted` oracle). Tombstones are PERMANENT correction
    * records here: a postings compaction absorbs the rows physically
    * ([[graft.util.Compaction.compactDir]]'s transform) but the
    * constants correction must outlive it. */
  def deleteFromBm25Index(spark: SparkSession, path: String,
      ids: DataFrame): Unit = {
    val idsDf = ids.select($"doc_id")
    val dl = spark.read.parquet(s"$path/postings")
      .join(idsDf, "doc_id")
      .groupBy($"doc_id").agg(max($"dl").as("dl"))
    val rows = idsDf.join(dl, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"dl", lit(0L)).as("dl"))
    graft.util.Tombstones.append(rows, path)
  }

  /** Resolve a persisted BM25 index into a serving handle: one schema
    * inference + one segment-stats fold (which also yields the committed
    * segment set — the commit filter and the constants come from the SAME
    * read, so they can never disagree), paid once per stream (signature
    * read FIRST so an append landing mid-prepare is caught by the next
    * trigger's check — the [[Pq.preparePqIndex]] ordering). */
  def prepareBm25Index(spark: SparkSession, path: String): StandingBm25 = {
    val sig = statsSignature(spark, path)
    val segRows = spark.read.parquet(s"$path/stats")
      .select($"seg", $"n_docs", $"total_dl").collect() // segment-count-sized
    // retraction correction: deleted docs leave the corpus constants
    // (their postings are anti-joined out at probe; N and Σdl shrink
    // here, from the same tombstone medium — deletes-count-sized)
    val (tsDocs, tsDl) = graft.util.Tombstones
      .idsOf(spark, path, "doc_id") match {
      case Some(_) =>
        val t = spark.read.parquet(graft.util.Tombstones.dir(path))
          .groupBy($"doc_id").agg(max($"dl").as("dl"))
          .agg(count(lit(1)), coalesce(sum($"dl"), lit(0L))).head()
        (t.getLong(0), t.getLong(1))
      case None => (0L, 0L)
    }
    StandingBm25(spark, path,
      spark.read.parquet(s"$path/postings").schema,
      segRows.map(_.getLong(1)).sum - tsDocs,
      segRows.map(_.getLong(2)).sum - tsDl,
      segRows.map(_.getString(0)).toSeq.sorted, sig)
  }

  /** Probe the standing index with a driver-small (query_id, text) batch:
    * fold segment stats (exact N, Σdl), prune the postings scan to the
    * query terms' tb directories (file-listing pruning — the lexical twin
    * of the IVF cell probe), then the same engine-exact scoring dag as
    * [[bm25TopK]]. Per-term df is counted over the pruned slice —
    * (term, doc_id) is unique across segments by the append contract. */
  def queryBm25Index(spark: SparkSession, path: String, queries: DataFrame,
      k: Int = 10, salts: Int = 8): DataFrame =
    queryStandingBm25(prepareBm25Index(spark, path), queries, k, salts)

  /** [[queryBm25Index]] through an already-prepared handle — the serving
    * hot path: no schema inference, no stats re-fold; one postings
    * listing per probe. Postings are filtered to COMMITTED segments (the
    * torn-append atomicity contract) and the per-term df aggregate
    * doubles as the (term, doc_id)-uniqueness guard: a violated append
    * contract fails loudly here instead of silently corrupting scores. */
  def queryStandingBm25(standing: StandingBm25, queries: DataFrame,
      k: Int = 10, salts: Int = 8): DataFrame = {
    val spark = standing.spark
    val path = standing.path
    val nDocs = standing.nDocs
    val totalDl = standing.totalDl
    val qterms = queries
      .select($"query_id", explode(TextAnalysis.tokens($"text")).as("term"))
      .distinct()
    // the probed "cells": distinct term buckets of the query batch —
    // query-sized by contract, so the collect is bounded like the IVF
    // probe-cell collect
    val buckets = qterms
      .select(pmod(xxhash64($"term"), lit(TermBuckets.toLong)).as("tb"))
      .distinct().collect().map(_.getLong(0))
    val qvocab = broadcast(qterms.select($"term").distinct())
    // per-directory chunked listing of ONLY the probed buckets
    // (Similarity.prunedScan — the StandingIvfPq.prunedCodes rationale): a
    // whole-tree read + partition filter would list every segment's files
    // in every bucket per probe, and past the parallel-discovery threshold
    // that listing becomes a distributed job on the serving hot path
    val fs = new org.apache.hadoop.fs.Path(s"$path/postings")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val postings = graft.util.Tombstones.antiJoin( // retractions fold out
      Similarity.prunedScan(spark, fs, s"$path/postings",
          standing.postingsSchema, buckets.map(_.toInt), partitionCol = "tb")
        .filter($"seg".isin(standing.committedSegs: _*)), // commit filter
      path, "doc_id")
      .join(qvocab, "term")
    // one aggregate, two jobs served: per-term df for idf AND the
    // uniqueness guard (df == distinct doc_ids — the append contract the
    // probe's df-by-count derivation depends on). The result is
    // query-vocabulary-sized, so collecting it costs what the broadcast
    // exchange cost before; idf then computes IN-PLAN over the collected
    // rows with the same Spark `log`/`round` the batch path uses.
    val dfRows = postings
      .groupBy($"term")
      .agg(count(lit(1)).as("df"), countDistinct($"doc_id").as("dfd"))
      .collect()
    dfRows.foreach { r =>
      require(r.getLong(1) == r.getLong(2),
        s"BM25 index at $path: term '${r.getString(0)}' has ${r.getLong(1)} " +
          s"postings over ${r.getLong(2)} distinct doc_ids — an append " +
          "re-used existing doc_ids, breaking the (term, doc_id) " +
          "uniqueness the probe's df derivation requires. Rebuild the " +
          "index or dedupe the offending segment.")
    }
    val idf = broadcast(
      spark.createDataFrame(
        dfRows.map(r => (r.getString(0), r.getLong(1))).toIndexedSeq)
        .toDF("term", "df")
        .select($"term", round(
          log((lit(nDocs) - $"df" + 0.5) / ($"df" + 0.5) + 1.0) * 1e6)
          .cast("long").as("idf_micros")))
    val weights = postings
      .join(idf, "term")
      .select($"doc_id", $"term",
        weightMicros($"idf_micros", $"tf", $"dl", nDocs, totalDl).as("wm"))
    val scored = weights.join(broadcast(qterms), "term")
      .filter($"doc_id" =!= $"query_id")
      .groupBy($"query_id", $"doc_id")
      .agg(sum($"wm").as("score_micros"))
      .select($"query_id", $"doc_id".as("vec_id"), $"score_micros")
    Similarity.topKPerQuery(scored, k, salts, "score_micros", asc = false)
      .select($"query_id", $"rk", $"vec_id".as("doc_id"), $"score_micros")
      .orderBy($"query_id", $"rk")
  }

  private def bm25IndexPath(sfDir: String): String = {
    val key = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.util.TmpDirs.perProcessDir("graft_bm25")}/$key"
  }

  /** Registered query (HASH-CHECKED): the AMORTIZED standing-index probe —
    * [[queryBm25Index]] over the persisted segment layout (build absorbed
    * by the bench's untimed warmup). Returns exactly [[bm25TopK]]'s rows —
    * the layout is an execution choice, not a semantic — so it shares
    * `bm25_topk`'s oracle, which makes the segment-stats fold, the
    * bucket-pruned scan, and the pruned-slice df count DuckDB-replayed
    * rather than only spec-pinned. */
  def bm25TopKIndexed(spark: SparkSession, sfDir: String,
      numQueries: Int = 3, k: Int = 10): DataFrame = {
    val path = bm25IndexPath(sfDir)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "stats"))) {
      writeBm25Index(Tables.documents(spark, sfDir)
        .select($"doc_id", $"text"), path)
    }
    val queries = Tables.documents(spark, sfDir)
      .filter($"doc_id" < numQueries)
      .select($"doc_id".as("query_id"), $"text")
    queryBm25Index(spark, path, queries, k)
  }

  private def bm25CompactPath(sfDir: String): String = {
    val key = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.util.TmpDirs.perProcessDir("graft_bm25_compact")}/$key"
  }

  /** Registered query (HASH-CHECKED): a probe THROUGH a COMPACTED lexical
    * index — the [[graft.operators.Pq.ivfPqTopKCompacted]] pattern on the
    * postings medium. The layout is deliberately fragmented the way a
    * real ingest leaves it (built from a third of the corpus, two more
    * segments appended — one-plus small files per touched term bucket per
    * segment), then [[graft.util.Compaction.compactDir]] rewrites the tb
    * directories to one sized file each and swaps them in place; the
    * stats directory is untouched, so the three segment rows still fold
    * to the batch constants (compaction preserves rows — the seg column
    * rides through, so the commit filter still sees every posting's
    * segment). Compaction preserves rows, segments union to the full
    * corpus, and (term, doc_id) stays unique — so this probe returns
    * exactly [[bm25TopK]]'s rows and shares `bm25_topk`'s oracle, making
    * postings-medium compaction DuckDB-replay-checked. The entry guards
    * the layout claim in-line: the rewrite must have strictly reduced the
    * file count. */
  def bm25TopKCompacted(spark: SparkSession, sfDir: String,
      numQueries: Int = 3, k: Int = 10): DataFrame = {
    val path = bm25CompactPath(sfDir)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "stats"))) {
      val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      writeBm25Index(docs.filter($"doc_id" % 3 === 0), path)
      (1 to 2).foreach { r =>
        appendToBm25Index(docs.filter($"doc_id" % 3 === r), path)
      }
      val stats = graft.util.Compaction.compactDir(spark, path, "postings",
        partitionCol = Some("tb"))
      require(stats.filesAfter < stats.filesBefore,
        s"compaction did not reduce the fragmented layout: $stats")
    }
    val queries = Tables.documents(spark, sfDir)
      .filter($"doc_id" < numQueries)
      .select($"doc_id".as("query_id"), $"text")
    queryBm25Index(spark, path, queries, k)
  }

  private def bm25DeletedPath(sfDir: String): String = {
    val key = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.util.TmpDirs.perProcessDir("graft_bm25_deleted")}/$key"
  }

  /** Registered query (HASH-CHECKED): the lexical DELETE lifecycle — the
    * index is built over the full corpus, three junk docs are APPENDED
    * (one sharing a query doc's exact text — a ranking-disturbing
    * duplicate; one novel; one EMPTY — the zero-postings dl=0 edge), then
    * DELETED ([[deleteFromBm25Index]] tombstones), then the postings are
    * physically ABSORBED (the compaction row transform; tombstones
    * remain as the permanent (N, Σdl) correction records). The probe
    * afterwards must return exactly [[bm25TopK]]'s rows —
    * append∘delete∘absorb is the identity on the index's semantics — so
    * the entry shares `bm25_topk`'s oracle: the tombstone fold, the
    * constants correction (N−3, Σdl−junk), and the absorbing rewrite are
    * all DuckDB-replayed. spec:TombstoneSpec pins the pre-absorb stage. */
  def bm25TopKDeleted(spark: SparkSession, sfDir: String,
      numQueries: Int = 3, k: Int = 10): DataFrame = {
    val path = bm25DeletedPath(sfDir)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "stats"))) {
      val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      writeBm25Index(docs, path)
      val qtext = String.valueOf(
        docs.filter($"doc_id" === 0L).head().getString(1))
      val junk = spark.createDataFrame(Seq(
        (900001L, qtext), (900002L, "junk retracted document"),
        (900003L, ""))).toDF("doc_id", "text")
      appendToBm25Index(junk, path)
      deleteFromBm25Index(spark, path, junk.select($"doc_id"))
      val stats = graft.util.Compaction.compactDir(spark, path, "postings",
        partitionCol = Some("tb"),
        transform = graft.util.Tombstones.antiJoin(_, path, "doc_id"))
      require(stats.filesAfter < stats.filesBefore,
        s"absorbing compaction did not reduce the layout: $stats")
    }
    val queries = Tables.documents(spark, sfDir)
      .filter($"doc_id" < numQueries)
      .select($"doc_id".as("query_id"), $"text")
    queryBm25Index(spark, path, queries, k)
  }

  /** The one RRF fusion core, shared by the batch entry
    * ([[hybridRrfTopK]]) and the hybrid serving twin
    * ([[graft.streaming.LexStream.hybridSearchQuery]]) so the fusion
    * arithmetic cannot fork: inputs are two (query_id, doc_id, rk)
    * rankings; each contributes round(10⁶/(rrfC+rank)) micros (EXACT
    * integers — the same double dag over the same ints in both engines),
    * summed per (query, doc), ranked desc with doc_id tiebreak, cut at k.
    * `n_lists` records whether a hit came from one ranker or both.
    *
    * Scale: both inputs are already queries×k-sized rankings — the fusion
    * itself is dashboard-sized regardless of corpus scale; all the heavy
    * lifting lives in (and is bounded by) the two component top-ks. */
  private[graft] def rrfFuse(lex: DataFrame, sem: DataFrame, k: Int,
      rrfC: Int): DataFrame = {
    def contrib(rk: Column) =
      round(lit(1e6) / (lit(rrfC) + rk)).cast("long")
    lex.select($"query_id", $"doc_id", contrib($"rk").as("c"))
      .unionByName(
        sem.select($"query_id", $"doc_id", contrib($"rk").as("c")))
      .groupBy($"query_id", $"doc_id")
      .agg(sum($"c").as("rrf_micros"), count(lit(1)).as("n_lists"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"rrf_micros".desc, $"doc_id")).cast("long"))
      .filter($"rk" <= k)
      .select($"query_id", $"rk", $"doc_id", $"rrf_micros", $"n_lists")
      .orderBy($"query_id", $"rk")
  }

  /** Hybrid retrieval: reciprocal-rank fusion of the lexical
    * ([[bm25TopK]]) and semantic ([[Similarity.cosineTopK]]) rankings —
    * the standard two-tower serving fusion ([[rrfFuse]]). */
  def hybridRrfTopK(spark: SparkSession, sfDir: String, numQueries: Int = 3,
      k: Int = 10, rrfC: Int = 60): DataFrame = {
    val lex = bm25TopK(spark, sfDir, numQueries, k)
      .select($"query_id", $"doc_id", $"rk")
    val sem = Similarity.cosineTopK(spark, sfDir, numQueries, k)
      .select($"query_id", $"vec_id".as("doc_id"), $"rk")
    rrfFuse(lex, sem, k, rrfC)
  }
}
