package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Similarity

/** Online vector search — the SERVING twin of the IVF family: a stream of
  * query vectors probes a PERSISTED cell-partitioned IVF index per
  * micro-batch ([[Similarity.loadIvfIndex]] / [[Similarity.queryIvfIndex]])
  * and the per-query top-k goes to `sink`. This is the other half of the
  * index lifecycle the batch entries already pin — build → persist →
  * append ([[Similarity.appendToIvfIndex]]) → PROBE CONTINUOUSLY.
  *
  * Topology per trigger: the query batch is collected to the driver
  * (bounded by the trigger size — a query batch is driver-small by the
  * same contract as [[Similarity.queryIvfIndex]]'s query set), its probe
  * cells are chosen against the once-loaded centroid matrix, and the
  * static `cell IN (...)` filter prunes the index scan to the probed
  * DIRECTORIES — each micro-batch reads only nprobe/nlist of the corpus,
  * exactly like the batch probe (PlanShapeSpec pins that plan). The index
  * side never shuffles; only per-cell candidates × broadcast queries are
  * scored.
  *
  * The CENTERS are loaded once at configure time — they are FROZEN by the
  * append contract ([[Similarity.appendToIvfIndex]] assigns to existing
  * centroids, never moves them), so re-reading them per trigger would be
  * pure overhead. The corpus frame IS re-read per batch (one cheap
  * metadata/listing pass), so probes observe vectors appended by a
  * concurrent ingest loop — probe-while-ingest, the standing contract of
  * the dedup streams. */
object AnnStream {

  def ivfSearchQuery(queryStream: DataFrame, indexPath: String, k: Int = 10,
      nprobe: Int = 4)(sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val centers =
      Similarity.loadCenters(queryStream.sparkSession, indexPath)
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val queries = batch.select($"vec_id", $"embedding")
          .as[(Long, Seq[Float])].collect().toSeq
        if (queries.nonEmpty)
          sink(Similarity.queryIvfIndex(
            Similarity.IvfIndex(
              spark.read.parquet(s"$indexPath/corpus"), centers),
            queries, k, nprobe),
            batchId)
      }
  }
}
