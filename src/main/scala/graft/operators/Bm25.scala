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
    // dl DENORMALIZED onto the exploded postings (the standing-index
    // layout's own trick, §"space-for-shuffle"): kills the probe-time
    // corpus-wide `lens` join — and with it one full tokenize pass — since
    // dl rides the group-by key (functionally dependent on doc_id).
    val exploded = docs.select($"doc_id", size($"toks").cast("long").as("dl"),
      explode($"toks").as("term"))
    val qterms = exploded.filter($"doc_id" < numQueries)
      .select($"doc_id".as("query_id"), $"term").distinct()
    val qvocab = broadcast(qterms.select($"term").distinct())
    // inverted-index slice: only query-term postings survive the explode;
    // the (query-vocab-pruned, tiny) tf table is lineage-cut ONCE — its two
    // consumers (the idf aggregate and the weight projection) would
    // otherwise each re-run the corpus-wide tokenize → explode → join pass,
    // the query's dominant stage. localCheckpoint here; reliable checkpoint
    // on a cluster.
    val tf = exploded.join(qvocab, "term")
      .groupBy($"doc_id", $"dl", $"term")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // df per term = one row per (doc, term) in tf — no second corpus pass
    val idf = broadcast(tf
      .groupBy($"term").agg(count(lit(1)).as("df"))
      .select($"term", round(
        log((lit(nDocs) - $"df" + 0.5) / ($"df" + 0.5) + 1.0) * 1e6)
        .cast("long").as("idf_micros")))
    val weights = tf
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

  /** (doc_id, seg) of a segment's ZERO-LENGTH docs — the membership record
    * for docs that count in the segment's n_docs but leave no postings.
    * Without it, [[deleteFromBm25Index]]'s live-doc check could not tell a
    * legitimately empty doc (must be deletable — it counts in N) from an
    * id that was never ingested (must be REJECTED — tombstoning it would
    * permanently skew every idf, see the delete doc). Empty-doc-count
    * sized: rare in any real corpus, so the medium stays trivial. */
  private def emptiesOf(toks: DataFrame, seg: String): DataFrame =
    toks.filter(size($"toks") === 0)
      .select($"doc_id", lit(seg).as("seg"))

  private val EmptiesSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("seg",
      org.apache.spark.sql.types.StringType)))

  /** The committed empty-doc membership rows — explicit schema + data-file
    * existence check because a corpus with no empty docs leaves the
    * directory absent or fileless (an empty write action publishes no
    * readable footer to infer from). */
  private def readEmpties(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$path/empties")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val hasData = fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith(".") && !n.startsWith("_")
    }
    if (hasData) spark.read.schema(EmptiesSchema).parquet(p.toString)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), EmptiesSchema)
  }

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
      // cluster to the term-bucket before the write: one file per tb per
      // segment instead of (tokenize tasks × 64 buckets) fragments — the
      // BatchAppend staging rationale; the pruned probe scan then opens
      // one file per (probed bucket, segment), guide §6
      postingsOf(toks, seg).repartition($"tb").write.mode(mode)
        .partitionBy("tb")
        .parquet(s"$path/postings")
      // empty-doc membership lands with the data, BEFORE the commit row —
      // an uncommitted segment's empties are invisible like its postings
      emptiesOf(toks, seg).coalesce(1).write.mode(mode)
        .parquet(s"$path/empties")
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
      graft.util.BatchAppend.append(emptiesOf(toks, batchTag),
        s"$path/empties", batchTag)
      val st = segmentStats(toks, batchTag).head()
      graft.util.BatchAppend.append(
        spark.createDataFrame(Seq((batchTag, st.getLong(1), st.getLong(2))))
          .toDF("seg", "n_docs", "total_dl"),
        s"$path/stats", batchTag)
      (st.getLong(1), st.getLong(2))
    } finally { val _ = toks.unpersist() }
  }

  /** A PREPARED standing handle on a persisted BM25 index — the lexical
    * twin of [[Pq.StandingPq]]: postings schema, the SEGMENT-folded corpus
    * constants (N, Σdl — uncorrected for deletes), the fold-record
    * corrections, and the COMMITTED segment set are resolved ONCE; each
    * probe then re-lists only the postings directory (appends land as new
    * files in their term buckets and stay visible) and reads the LIVE
    * tombstones freshly — the delete correction is probe-time state, not
    * prepare-time state, so the anti-join and the constants always come
    * from one snapshot ([[queryStandingBm25]]). `statsSig` is the change
    * signature: every append adds a stats file, a rebuild rewrites the
    * directory, and a fold adds a tsfold record — a serving loop that
    * re-prepares on signature change always scores with the constants,
    * the commit filter, and the fold exclusions that match the postings
    * it reads. */
  final case class StandingBm25(spark: SparkSession, path: String,
      postingsSchema: org.apache.spark.sql.types.StructType,
      segDocs: Long, segDl: Long, foldedDocs: Long, foldedDl: Long,
      foldedFiles: Set[String], committedSegs: Seq[String],
      statsSig: Seq[(String, Long, Long)])

  /** Cheap change signature of the index's STATS directory PLUS its
    * tombstone and fold-record directories — (name, length, mtime) per
    * file, three listings. Appends add a stats file, rebuilds rewrite the
    * directory, a DELETE adds a tombstone file, and a FOLD adds a tsfold
    * record ((N, Σdl) derivation changes in all four cases — the serving
    * loop's currency check must fire for each); tombstone and fold
    * entries are name-prefixed so the directories cannot alias. */
  private[graft] def statsSignature(spark: SparkSession,
      path: String): Seq[(String, Long, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(s"$path/stats")
    val own = p.getFileSystem(conf).listStatus(p)
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_._1).toSeq
    val foldDir = new org.apache.hadoop.fs.Path(tsFoldDir(path))
    val foldFs = foldDir.getFileSystem(conf)
    val folds =
      if (!foldFs.exists(foldDir)) Nil
      else foldFs.listStatus(foldDir)
        .map(st => (s"tf:${st.getPath.getName}", st.getLen,
          st.getModificationTime))
        .sortBy(_._1).toSeq
    own ++ folds ++ graft.util.Tombstones.signature(spark, path)
      .map { case (n, l, t) => (s"ts:$n", l, t) }
  }

  private def committedSegsOf(spark: SparkSession,
      path: String): Seq[String] =
    spark.read.parquet(s"$path/stats").select($"seg")
      .collect().map(_.getString(0)).toSeq.sorted // segment-count-sized

  /** DELETE documents from a standing BM25 index — the lexical retraction
    * contract ([[graft.util.Tombstones]]): tombstone rows carry
    * (doc_id, dl) because BM25's global constants must shrink with the
    * deletion — N by one per doc, Σdl by the doc's length — and no
    * postings rewrite can express that (stats rows are per-segment
    * aggregates). Tombstones are CORRECTION RECORDS, so the ids are
    * VALIDATED against the live committed corpus before any lands:
    *
    *  - ids with committed postings record their dl (one postings scan —
    *    delete-time cost, not probe-time);
    *  - zero-length docs (no postings, but counted in their segment's
    *    n_docs) prove membership through the `empties/` medium and record
    *    dl = 0;
    *  - already-tombstoned ids are SKIPPED (idempotent re-delete — no
    *    duplicate row, so a doc_id holds at most one tombstone ever, the
    *    invariant the per-file fold retirement needs);
    *  - anything else FAILS LOUDLY: an unknown id (a takedown for a doc
    *    never ingested, a doc in a torn uncommitted segment, or a doc
    *    already deleted AND absorbed+folded away) must not decrement N —
    *    a wrong tombstone is permanent idf skew for every future probe.
    *
    * Probes then fold the live tombstones twice over: the candidate
    * anti-join and the (N, Σdl) correction, both from the same snapshot —
    * results are bit-equal to a batch scorer over the retained corpus
    * (the `bm25_topk_deleted` oracle). The medium is BOUNDED by
    * [[absorbBm25Deletes]]: once postings absorb carry-free, the
    * correction folds into one tsfold commit record and the tombstone
    * files retire. */
  def deleteFromBm25Index(spark: SparkSession, path: String,
      ids: DataFrame): Unit = {
    val idsDf = ids.select($"doc_id").distinct()
    val committed = committedSegsOf(spark, path)
    val withDl = spark.read.parquet(s"$path/postings")
      .filter($"seg".isin(committed: _*))
      .join(broadcast(idsDf), "doc_id")
      .groupBy($"doc_id").agg(max($"dl").as("dl"))
    val empties = readEmpties(spark, path)
      .filter($"seg".isin(committed: _*))
      .join(broadcast(idsDf), "doc_id")
      .select($"doc_id").distinct()
      .select($"doc_id", lit(0L).as("dl"))
    val live = withDl.unionByName(empties)
    val alreadyTombstoned = graft.util.Tombstones.idsOf(spark, path, "doc_id")
    val fresh = (alreadyTombstoned match {
      case Some(ts) => live.join(ts, Seq("doc_id"), "left_anti")
      case None => live
    }).persist()
    try {
      // loud on unknown ids: not live-committed and not already tombstoned
      val known = live.select($"doc_id").unionByName(
        alreadyTombstoned.getOrElse(empties.select($"doc_id").limit(0)))
      val unknown = idsDf.join(known, Seq("doc_id"), "left_anti")
        .limit(5).collect().map(_.getLong(0))
      require(unknown.isEmpty,
        s"BM25 index at $path: delete requested for doc_ids with no live " +
          s"committed membership (examples: ${unknown.mkString(", ")}) — " +
          "tombstoning an unknown id would permanently shrink N and skew " +
          "every idf. Ids must be committed corpus docs (postings or " +
          "recorded empty docs) that have not already been absorbed.")
      if (fresh.limit(1).count() > 0)
        graft.util.Tombstones.append(fresh.select($"doc_id", $"dl"), path)
    } finally { val _ = fresh.unpersist() }
  }

  // ------------------------------------------------------------------
  // TSFOLD — bounding the tombstone medium. BM25 tombstones outlive the
  // postings absorb because they carry the (N, Σdl) correction no postings
  // rewrite can express — but "permanent correction records" grow with
  // lifetime deletes, and every probe pays the anti-join + correction scan
  // over all of them. Once a carry-free absorb has made the deletions
  // physical, a tombstone's ONLY remaining job is its correction — so it
  // folds into one commit record in `tsfold/`: (n_docs, total_dl, the
  // FOLDED FILE NAMES). Readers subtract fold corrections AND exclude the
  // named files from every tombstone read, which makes the protocol
  // crash-safe with one commit: record written + files still on disk
  // (a crash before GC) double-counts nothing — the files are excluded by
  // name; files deleted — the record alone carries the correction; crash
  // before the record — nothing changed. File GC is idempotent catch-up
  // work the next fold retries. Probe-time anti-join cost drops to the
  // UNFOLDED (recent) deletes.
  // ------------------------------------------------------------------

  private[graft] def tsFoldDir(path: String): String = s"$path/tsfold"

  private val TombstoneSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("dl",
      org.apache.spark.sql.types.LongType)))

  /** All fold records, summed, plus the union of folded file names —
    * fold-count-sized (one row per absorb that retired tombstones). */
  private def readFolds(spark: SparkSession,
      path: String): (Long, Long, Set[String]) = {
    val p = new org.apache.hadoop.fs.Path(tsFoldDir(path))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val hasData = fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith(".") && !n.startsWith("_")
    }
    if (!hasData) (0L, 0L, Set.empty)
    else {
      val rows = spark.read.parquet(p.toString)
        .select($"n_docs", $"total_dl", $"files").collect()
      (rows.map(_.getLong(0)).sum, rows.map(_.getLong(1)).sum,
        rows.flatMap(_.getSeq[String](2)).toSet)
    }
  }

  /** The LIVE (unfolded) tombstone frame, deduped on doc_id — or None when
    * every tombstone file is folded or none ever landed (probes skip the
    * anti-join and the correction job entirely then: one listing, zero
    * jobs — the no-delete hot path). ONE directory listing snapshot feeds
    * both the probe's anti-join and its (N, Σdl) correction. */
  private def liveTombstones(spark: SparkSession, path: String,
      foldedFiles: Set[String]): Option[DataFrame] = {
    val live = graft.util.Tombstones.dataFiles(spark, path)
      .filterNot(st => foldedFiles.contains(st.getPath.getName))
    if (live.isEmpty) None
    else Some(spark.read.schema(TombstoneSchema)
      .parquet(live.map(_.getPath.toString): _*)
      .groupBy($"doc_id").agg(max($"dl").as("dl")))
  }

  /** Count of LIVE (unfolded) tombstone data files — the pressure signal
    * the BM25 ingest loop's maintenance slot watches
    * ([[graft.streaming.LexStream.bm25IngestQuery]]): folded files are
    * excluded by name exactly as every reader excludes them, so
    * crash-window leftovers (record written, GC pending) exert no
    * pressure. One fold-record read + one directory listing. */
  private[graft] def liveTombstoneFileCount(spark: SparkSession,
      path: String): Int = {
    val (_, _, foldedFiles) = readFolds(spark, path)
    graft.util.Tombstones.dataFiles(spark, path)
      .count(st => !foldedFiles.contains(st.getPath.getName))
  }

  /** Physically ABSORB tombstoned postings and BOUND the tombstone medium:
    * the postings compact through [[graft.util.Compaction.compactDir]]
    * with the anti-join as the row transform, and — iff the rewrite was
    * carry-free (no replayable file still holds masked rows) — the
    * pre-absorb tombstone snapshot FOLDS: its (N, Σdl) correction is
    * written as one `tsfold/` commit record (same fold arithmetic the
    * probe used — spec-pinned bit-equal probes across the fold) and the
    * snapshot files retire. Deletes landing DURING the absorb stay live:
    * the snapshot is listed before the rewrite starts, and the rewrite's
    * own fresh anti-join covers at least the snapshot. Serving handles
    * prepared before the fold re-prepare on the statsSignature change
    * (fold records are part of the signature). */
  def absorbBm25Deletes(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20,
      safeBatchFence: Option[Long] = None)
      : graft.util.Compaction.CompactionStats = {
    val (_, _, foldedFiles) = readFolds(spark, path)
    val snapshot = graft.util.Tombstones.dataFiles(spark, path)
      .filterNot(st => foldedFiles.contains(st.getPath.getName))
    val stats = graft.util.Compaction.compactDir(spark, path, "postings",
      partitionCol = Some("tb"), targetBytes = targetBytes,
      safeBatchFence = safeBatchFence,
      transform = graft.util.Tombstones.antiJoin(_, path, "doc_id"))
    // the EMPTIES membership medium absorbs in the SAME unit: an empty
    // doc's tombstone folds away below, so its empties row must leave too
    // — otherwise it still reads as live committed membership and a
    // re-delete after the fold lands a SECOND (N-1, dl=0) correction
    // (permanent double-counted idf skew). Post-fold, a re-delete of an
    // absorbed empty doc finds neither postings, empties, nor a live
    // tombstone — and fails loudly, the same contract as absorbed
    // postings docs. Skipped when no tombstone is in play (absent or
    // fileless directory compacts to nothing).
    val emptiesCarry: Long =
      if (snapshot.isEmpty) 0L
      else {
        val ep = new org.apache.hadoop.fs.Path(s"$path/empties")
        val efs = ep.getFileSystem(spark.sessionState.newHadoopConf())
        if (!efs.exists(ep)) 0L
        else graft.util.Compaction.compactDir(spark, path, "empties",
          targetBytes = targetBytes, safeBatchFence = safeBatchFence,
          transform = graft.util.Tombstones.antiJoin(_, path, "doc_id"))
          .carriedFiles
      }
    if (stats.carriedFiles == 0L && emptiesCarry == 0L &&
        snapshot.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(
        graft.util.Tombstones.dir(path))
        .getFileSystem(spark.sessionState.newHadoopConf())
      // GC catch-up: files folded by a PAST record but never deleted (a
      // crash in that fold's GC step) — every reader already excludes
      // them by name, so deletion is pure idempotent cleanup
      graft.util.Tombstones.dataFiles(spark, path)
        .filter(st => foldedFiles.contains(st.getPath.getName))
        .foreach(st => fs.delete(st.getPath, false))
      val corr = spark.read.schema(TombstoneSchema)
        .parquet(snapshot.map(_.getPath.toString): _*)
        .groupBy($"doc_id").agg(max($"dl").as("dl"))
        .agg(count(lit(1)), coalesce(sum($"dl"), lit(0L))).head()
      spark.createDataFrame(Seq((corr.getLong(0), corr.getLong(1),
        snapshot.map(_.getPath.getName))))
        .toDF("n_docs", "total_dl", "files")
        .coalesce(1).write.mode("append").parquet(tsFoldDir(path))
      // the COMMIT is the record above; file GC may crash and be retried
      snapshot.foreach(st => fs.delete(st.getPath, false))
    }
    stats
  }

  /** Resolve a persisted BM25 index into a serving handle: one schema
    * inference + one segment-stats fold (which also yields the committed
    * segment set — the commit filter and the constants come from the SAME
    * read, so they can never disagree) + one fold-record read, paid once
    * per stream (signature read FIRST so a mutation landing mid-prepare
    * is caught by the next trigger's check — the [[Pq.preparePqIndex]]
    * ordering). Live tombstones are deliberately NOT resolved here — the
    * probe reads them freshly so its anti-join and constants share one
    * snapshot. */
  def prepareBm25Index(spark: SparkSession, path: String): StandingBm25 = {
    val sig = statsSignature(spark, path)
    val segRows = spark.read.parquet(s"$path/stats")
      .select($"seg", $"n_docs", $"total_dl").collect() // segment-count-sized
    val (foldedDocs, foldedDl, foldedFiles) = readFolds(spark, path)
    StandingBm25(spark, path,
      spark.read.parquet(s"$path/postings").schema,
      segRows.map(_.getLong(1)).sum,
      segRows.map(_.getLong(2)).sum,
      foldedDocs, foldedDl, foldedFiles,
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
    * contract fails loudly here instead of silently corrupting scores.
    * Live tombstones are read FRESHLY per probe, ONCE: the same snapshot
    * feeds the candidate anti-join and the (N, Σdl) correction, so a
    * delete landing after prepare scores with consistent POST-delete
    * semantics at the next probe (never postings-dropped-but-
    * constants-stale — the mixed state a prepare-time correction had).
    * Already-folded corrections come off the handle (fold records are
    * prepare-time state; the signature covers them). */
  def queryStandingBm25(standing: StandingBm25, queries: DataFrame,
      k: Int = 10, salts: Int = 8): DataFrame = {
    val spark = standing.spark
    val path = standing.path
    // ONE live-tombstone snapshot per probe — anti-join AND constants
    val liveTs = liveTombstones(spark, path, standing.foldedFiles)
    val (tsDocs, tsDl) = liveTs match {
      case Some(t) =>
        val r = t.agg(count(lit(1)),
          coalesce(sum($"dl"), lit(0L))).head() // deletes-count-sized job
        (r.getLong(0), r.getLong(1))
      case None => (0L, 0L)
    }
    val nDocs = standing.segDocs - standing.foldedDocs - tsDocs
    val totalDl = standing.segDl - standing.foldedDl - tsDl
    // ONE bounded collect of the (query-sized by contract) term set serves
    // every query-side derivation: the probed buckets (driver arithmetic —
    // the same xxhash64-seed-42 + pmod the SQL expression computes), the
    // broadcast vocab, and the scored join's (query_id, term) frame. The
    // previous shape planned three separate jobs over the query scan
    // (buckets collect, qvocab exchange, scored join side) on the serving
    // hot path.
    val qtermRows = queries
      .select($"query_id", explode(TextAnalysis.tokens($"text")).as("term"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toIndexedSeq
    val qterms = spark.createDataFrame(qtermRows).toDF("query_id", "term")
    val buckets = qtermRows.map { case (_, t) =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      ((h % TermBuckets) + TermBuckets) % TermBuckets
    }.distinct
    val qvocab = broadcast(spark
      .createDataFrame(qtermRows.map(_._2).distinct.map(Tuple1(_)))
      .toDF("term"))
    // per-directory chunked listing of ONLY the probed buckets
    // (Similarity.prunedScan — the StandingIvfPq.prunedCodes rationale): a
    // whole-tree read + partition filter would list every segment's files
    // in every bucket per probe, and past the parallel-discovery threshold
    // that listing becomes a distributed job on the serving hot path
    val fs = new org.apache.hadoop.fs.Path(s"$path/postings")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val pruned = Similarity.prunedScan(spark, fs, s"$path/postings",
        standing.postingsSchema, buckets.map(_.toInt), partitionCol = "tb")
      .filter($"seg".isin(standing.committedSegs: _*)) // commit filter
    val postings = (liveTs match { // retractions fold out, SAME snapshot
      case Some(t) => pruned.join(t.select($"doc_id"), Seq("doc_id"),
        "left_anti")
      case None => pruned
    }).join(qvocab, "term")
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
    * DELETED ([[deleteFromBm25Index]] tombstones — the empty doc proves
    * membership through the empties medium), then physically ABSORBED and
    * FOLDED ([[absorbBm25Deletes]]: the compaction row transform drops
    * the postings, the (N, Σdl) correction folds into one tsfold commit
    * record, and the tombstone files retire — the medium is bounded, not
    * permanent). The probe afterwards must return exactly [[bm25TopK]]'s
    * rows — append∘delete∘absorb∘fold is the identity on the index's
    * semantics — so the entry shares `bm25_topk`'s oracle: the tombstone
    * fold, the constants correction (N−3, Σdl−junk, now carried by the
    * fold record), and the absorbing rewrite are all DuckDB-replayed.
    * spec:TombstoneSpec pins the pre-absorb stage and the fold's
    * crash-window invariants. */
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
      val stats = absorbBm25Deletes(spark, path)
      require(stats.filesAfter < stats.filesBefore,
        s"absorbing compaction did not reduce the layout: $stats")
      require(!graft.util.Tombstones.exists(spark, path),
        "carry-free absorb did not fold+retire the tombstone files")
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
