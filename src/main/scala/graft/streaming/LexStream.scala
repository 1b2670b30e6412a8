package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Bm25

/** Online lexical search — the SERVING twin of the BM25 standing index
  * ([[Bm25.writeBm25Index]] / [[Bm25.appendToBm25Index]]), completing the
  * lexical tier's lifecycle the same way [[AnnStream.pqSearchQuery]]
  * completes the compressed vector tier's: build → persist → append →
  * PROBE CONTINUOUSLY.
  *
  * Per trigger the (query_id, text) micro-batch tokenizes in-plan, its
  * term set maps to a handful of term-bucket directories (the bounded
  * probe-cell collect of the batch probe), and only those postings
  * directories are listed and read — which is exactly what keeps
  * probe-while-ingest alive: documents appended by a concurrent ingest
  * land as new files in their term buckets plus one stats row, and the
  * next trigger's listing sees them.
  *
  * The STANDING side is a [[Bm25.prepareBm25Index]] handle resolved once:
  * postings schema and the folded (N, Σdl) corpus constants. Those
  * constants CHANGE on append (unlike the frozen IVF centroids), so the
  * per-trigger currency check is load-bearing for scoring correctness,
  * not just plan hygiene: every append adds a stats file, every rebuild
  * rewrites the stats directory, and the signature check below re-folds
  * the constants whenever that happens — a probe therefore always scores
  * with the (N, Σdl) that match the postings it reads (one trigger of
  * skew at most, the same freshness contract as the vector tiers'
  * signature checks).
  *
  * Failure contract (the [[AnnStream]] serving contract verbatim): the
  * probe is materialized via `localCheckpoint` BEFORE the sink so a sink
  * retry never re-runs the probe against a newer index state; a probe
  * that throws (e.g. the index swapped mid-listing) re-prepares the
  * handle and retries ONCE.
  */
object LexStream {

  /** Standing BM25 serving query: probe the persisted index with each
    * micro-batch of (query_id, text) rows; per-query top-k to `sink`. */
  def bm25SearchQuery(queryStream: DataFrame, indexPath: String,
      k: Int = 10)(sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val spark = queryStream.sparkSession
    var standing = Bm25.prepareBm25Index(spark, indexPath)
    // configure-time plan warm-up: one synthetic single-query probe
    // compiles the serving stages (tokenize, bucket-pruned scan, idf
    // broadcast, score + top-k) so batch 1 pays data, not codegen
    locally {
      import spark.implicits._
      val warm = Seq((-1L, "graft warmup probe")).toDF("query_id", "text")
      val _ = Bm25.queryStandingBm25(standing, warm, k).count()
    }
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        // currency check: a changed stats signature means appended
        // segments or a rebuild — re-fold (N, Σdl) so scoring matches
        // the postings the pruned scan is about to read. Try-wrapped: a
        // listing race against a concurrent swap defers to next trigger.
        scala.util.Try(Bm25.statsSignature(spark, indexPath))
          .foreach { sig =>
            if (sig != standing.statsSig)
              scala.util.Try(Bm25.prepareBm25Index(spark, indexPath))
                .foreach(standing = _)
          }
        if (!batch.isEmpty) {
          val queries = batch.select($"query_id", $"text")
          def probe(): DataFrame =
            Bm25.queryStandingBm25(standing, queries, k).localCheckpoint(true)
          val result =
            try probe()
            catch {
              case scala.util.control.NonFatal(_) =>
                standing = Bm25.prepareBm25Index(spark, indexPath)
                probe()
            }
          sink(result, batchId)
        }
      }
  }

  /** The lexical tier's INGEST loop — the missing half of the BM25
    * standing index's streaming lifecycle ([[bm25SearchQuery]] serves;
    * this appends): each (doc_id, text) micro-batch lands as ONE segment
    * through [[Bm25.appendSegmentTagged]] — postings into their term
    * buckets and the stats commit row, BOTH under
    * [[graft.util.BatchAppend]]'s stage → clean → publish protocol keyed
    * by the batch id. A replayed batch (foreachBatch's at-least-once)
    * therefore re-publishes the SAME segment files instead of
    * double-counting N/Σdl/df, with no fence state needed at all: the
    * idempotence lives entirely in the tagged protocol, and a torn replay
    * (postings republished, stats not yet) leaves the segment uncommitted
    * — invisible to probes — until the replay completes it
    * (LexStreamSpec pins both). A concurrent [[bm25SearchQuery]] picks
    * each append up via its per-trigger stats-signature check.
    *
    * `autoCompactMaxFiles` arms the fragmentation watch: when the
    * postings directory's data-file count (one listing per trigger — the
    * same cost a probe's pruned listing pays) exceeds the ceiling,
    * [[graft.util.Compaction.compactDir]] rewrites the term buckets in
    * the driver-sequenced maintenance slot this foreachBatch IS — appends
    * are sequenced out by construction. The safe fence is `batchId - 1`:
    * the current batch has not committed to the checkpoint yet and may
    * replay, so its tagged files ride through the rewrite verbatim.
    *
    * `autoCompactMaxTombstones` arms the TOMBSTONE-PRESSURE watch in the
    * same slot (the [[AnnStream]] monitors' twin): past the bound of
    * live unfolded tombstone files, the slot runs
    * [[graft.operators.Bm25.absorbBm25Deletes]] under the same fence —
    * absorbing postings + empties and folding the (N, Σdl) correction
    * when carry-free — so a delete-heavy stream cannot grow probe-time
    * anti-join cost indefinitely below the fragmentation ceiling.
    *
    * One audit row per delivered batch to `sink`:
    * (batch_id, seg_docs, seg_total_dl, compacted).
    *
    * Scale per trigger: tokenize + two bounded writes of the BATCH (never
    * the corpus); the stats medium stays segment-count-sized; global
    * state is never rewritten — the Lucene segment shape, which is what
    * makes lexical ingest embarrassingly appendable at 100 TB. */
  def bm25IngestQuery(docStream: DataFrame, indexPath: String,
      autoCompactMaxFiles: Option[Long] = None,
      autoCompactMaxTombstones: Option[Long] = None)
      (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBm25IngestBatch(batch, batchId, indexPath,
          autoCompactMaxFiles, autoCompactMaxTombstones)(sink)
      }

  /** One BM25 ingest micro-batch — [[bm25IngestQuery]]'s foreachBatch
    * body, exposed so the replay-idempotence and auto-compaction
    * lifecycles are directly testable (the
    * [[AnnStream.processIngestBatch]] convention). */
  private[graft] def processBm25IngestBatch(batch: DataFrame, batchId: Long,
      indexPath: String, autoCompactMaxFiles: Option[Long],
      autoCompactMaxTombstones: Option[Long] = None)
      (sink: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    // TOMBSTONE PRESSURE (the AnnStream.maybeAutoCompact twin for the
    // lexical tier): past the bound of LIVE (unfolded) tombstone files,
    // the slot runs the full absorb — postings AND empties compact, and
    // iff carry-free the (N, Σdl) correction FOLDS into one tsfold
    // record and the files retire. A delete-heavy, append-light stream
    // otherwise accumulates per-probe anti-join + correction-scan cost
    // forever below the fragmentation ceiling. Checked BEFORE the
    // append: this batch's files don't exist yet, so the slot's own
    // publish can never carry itself past the fold (and the absorb
    // includes the fragmentation rewrite, making the frag check below
    // redundant in the same slot). Carry above the fence (an earlier
    // replayable batch) still skips the fold; pressure re-fires at a
    // later slot whose fence has advanced — eventually-folding, never
    // lost.
    val absorbed = autoCompactMaxTombstones.exists { bound =>
      Bm25.liveTombstoneFileCount(spark, indexPath).toLong > bound && {
        val _ = Bm25.absorbBm25Deletes(spark, indexPath,
          safeBatchFence = Some(batchId - 1L))
        true
      }
    }
    // an EMPTY batch publishes NO segment: a zero-doc segment carries no
    // postings, no empties, and (0, 0) stats — publishing one per trigger
    // would grow the stats medium (and the committed-segment set every
    // probe filters on) without bound on a delete-heavy, append-light
    // stream, and its tagged files would carry above every same-slot
    // fence. The replay contract is unaffected (a replayed empty batch
    // re-skips identically).
    val (nDocs, totalDl) =
      if (batch.isEmpty) (0L, 0L)
      else Bm25.appendSegmentTagged(
        batch.selectExpr("doc_id", "text"), indexPath,
        graft.util.BatchAppend.tag(batchId))
    val compacted = absorbed || autoCompactMaxFiles.exists { limit =>
      val postings = s"$indexPath/postings"
      graft.util.Compaction.dataFileCount(spark, postings) > limit && {
        // retracted postings absorb physically during the rewrite the
        // watch fires anyway (the AnnStream.maybeAutoCompact note);
        // tombstones are NOT retired or folded here — the (N, Σdl)
        // correction must keep standing until an explicit
        // [[graft.operators.Bm25.absorbBm25Deletes]] folds it into a
        // tsfold commit record (anti-joining an already-folded id's
        // absent postings is a no-op, so the whole-dir read is safe)
        val stats = graft.util.Compaction.compactDir(spark, indexPath,
          "postings", partitionCol = Some("tb"),
          safeBatchFence = Some(batchId - 1L),
          transform =
            graft.util.Tombstones.antiJoin(_, indexPath, "doc_id"))
        stats.filesAfter < stats.filesBefore
      }
    }
    sink(Seq((batchId, nDocs, totalDl, compacted))
      .toDF("batch_id", "seg_docs", "seg_total_dl", "compacted"), batchId)
  }

  /** HYBRID retrieval serving — the two-tower query path real retrieval
    * runs, fused per micro-batch: each (query_id, text, embedding) batch
    * probes the standing BM25 index ([[Bm25.queryStandingBm25]] — term-
    * bucket-pruned postings scan) AND the standing IVF index
    * ([[graft.operators.Similarity.queryStandingIvf]] — cell-directory-
    * pruned vector scan), and the two queries×k rankings fuse through the
    * ONE RRF core the batch entry uses ([[Bm25.rrfFuse]] — shared so the
    * serving fusion cannot drift from `hybrid_rrf_topk`'s oracle-checked
    * arithmetic; LexStreamSpec pins stream ≡ batch at full probe width).
    *
    * Standing sides and failure contract are the component twins'
    * verbatim: both handles prepare once; per trigger BOTH signatures are
    * currency-checked (stats for the lexical leg — append-sensitive by
    * design; centers for the vector leg — retrain-sensitive), the fused
    * probe materializes via localCheckpoint BEFORE the sink, and a probe
    * that loses a race to a concurrent swap re-prepares both handles and
    * retries ONCE. Per-trigger cost is exactly one lexical probe + one
    * vector probe + a queries×2k-sized fusion — the fusion adds nothing
    * corpus-scaled. */
  def hybridSearchQuery(queryStream: DataFrame, bm25Path: String,
      ivfPath: String, k: Int = 10, nprobe: Int = 4, rrfC: Int = 60)
      (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    import graft.operators.Similarity
    val spark = queryStream.sparkSession
    var lexStanding = Bm25.prepareBm25Index(spark, bm25Path)
    var semStanding = Similarity.prepareIvfIndex(spark, ivfPath)

    def fused(batch: DataFrame): DataFrame = {
      import spark.implicits._
      val lex = Bm25.queryStandingBm25(lexStanding,
          batch.select($"query_id", $"text"), k)
        .select($"query_id", $"doc_id", $"rk")
      val sem = Similarity.queryStandingIvf(semStanding,
          batch.select($"query_id".as("vec_id"), $"embedding"), k, nprobe)
        .select($"query_id", $"vec_id".as("doc_id"), $"rk")
      Bm25.rrfFuse(lex, sem, k, rrfC)
    }

    // configure-time plan warm-up: one synthetic single-query probe through
    // BOTH legs + the fusion so batch 1 pays data, not codegen
    if (semStanding.centers.nonEmpty) {
      import spark.implicits._
      val warm = Seq((-1L, "graft warmup probe",
        semStanding.centers.head.map(_.toFloat).toSeq))
        .toDF("query_id", "text", "embedding")
      val _ = fused(warm).count()
    }
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        scala.util.Try(Bm25.statsSignature(spark, bm25Path)).foreach { sig =>
          if (sig != lexStanding.statsSig)
            scala.util.Try(Bm25.prepareBm25Index(spark, bm25Path))
              .foreach(lexStanding = _)
        }
        scala.util.Try(Similarity.centersSignature(spark, ivfPath))
          .foreach { sig =>
            if (sig != semStanding.centersSig)
              scala.util.Try(Similarity.prepareIvfIndex(spark, ivfPath))
                .foreach(semStanding = _)
          }
        if (!batch.isEmpty) {
          def probe(): DataFrame = fused(batch).localCheckpoint(true)
          val result =
            try probe()
            catch {
              case scala.util.control.NonFatal(_) =>
                lexStanding = Bm25.prepareBm25Index(spark, bm25Path)
                semStanding = Similarity.prepareIvfIndex(spark, ivfPath)
                probe()
            }
          sink(result, batchId)
        }
      }
  }
}
