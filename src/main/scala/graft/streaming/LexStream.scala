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
}
