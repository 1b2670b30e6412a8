package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming throughput soak harness — shared by the CI floor gate
  * (StreamingSoakSpec, 4-core test session) and the artifact main
  * ([[graft.StreamSoak]], which records BOTH the 4-core and the bench-box
  * 32-core geometry into STREAMBENCH.json).
  */
object Soak {

  final case class Result(totalRows: Long, batches: Int, rowsPerSec: Long,
      meanBatchMs: Long, maxBatchMs: Long)

  /** Let the query soak, then summarize its non-empty micro-batches:
    * processing throughput (rows over trigger-execution time, idle waits
    * excluded) and batch latency. The query is stopped BEFORE the progress
    * snapshot — a micro-batch completing between a snapshot and stop()
    * would be sunk but unreported, breaking rows-accounting at the sink.
    */
  def soak(q: StreamingQuery, soakMs: Long): Result = {
    Thread.sleep(soakMs)
    q.stop()
    q.awaitTermination()
    val progress = q.recentProgress.toSeq
    val busy = progress.filter(_.numInputRows > 0)
    val durs = busy.map(_.durationMs.get("triggerExecution").toLong)
    val rows = busy.map(_.numInputRows).sum
    val durMs = math.max(durs.sum, 1L)
    Result(rows, busy.size, rows * 1000L / durMs,
      if (busy.isEmpty) 0L else durs.sum / busy.size, (0L +: durs).max)
  }

  def json(s: Result): String =
    s"""{"total_rows":${s.totalRows},"batches":${s.batches},""" +
      s""""rows_per_sec":${s.rowsPerSec},"mean_batch_ms":${s.meanBatchMs},""" +
      s""""max_batch_ms":${s.maxBatchMs}}"""

  /** Deterministic pseudo-document text from a numeric seed column: 12
    * "words" per doc, enough length to shingle — the per-row cost of a real
    * probe (shingle → 128-slot minhash → banding) without fixture I/O. */
  private def synthText(seed: org.apache.spark.sql.Column) =
    concat_ws(" ",
      (0 until 12).map(i => pmod(seed * (31 + i) + i, lit(9973)).cast("string")): _*)

  /** Streaming incremental dedup against a persisted band index — the
    * ingest loop's throughput number. Synthesizes a standing corpus,
    * persists its band index bucketed (build untimed: it's the standing
    * artifact), then soaks a rate-source document stream whose
    * micro-batches probe the index via [[DedupStream]]; the sink counts
    * the emitted pairs so every batch pays the full probe + verify. */
  def dedupRun(spark: SparkSession, corpusDocs: Int, docsRate: Int,
      tag: String, soakMs: Long = 20000): Result = {
    // longer soak than the row-shaped pipelines: a probe micro-batch is a
    // multi-join query (banding + index join + verify), so the first batch
    // alone costs seconds of plan/codegen warmup before steady state
    val corpus = spark.range(corpusDocs.toLong)
      .select(col("id").as("doc_id"), synthText(col("id")).as("text"))
    val table = s"graft_soak_band_index_$tag"
    graft.operators.Dedup.writeBandIndex(corpus, table, location = Some(
      s"${graft.util.TmpDirs.perProcessDir("graft_soak_bandidx")}/$tag"))
    val docs = spark.readStream.format("rate")
      .option("rowsPerSecond", docsRate.toString).load()
      .select((col("value") + corpusDocs).as("doc_id"),
        synthText(col("value") * 7 + 3).as("text"))
    val q = DedupStream.incrementalDedupQuery(docs, corpus, table) {
      (pairs, _) => val _ = pairs.count()
    }.start()
    try soak(q, soakMs)
    finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  /** Drive the two always-on pipelines — the collection sink (track filter →
    * sanitize → per-batch text sink) and the watermarked tumbling-window
    * aggregation — each for `soakMs` against the rate source at the given
    * rates. Returns (collector result, rows actually sunk, hourly result).
    */
  def run(spark: SparkSession, collectorRate: Int, eventsRate: Int,
      outDir: String, soakMs: Long = 8000): (Result, Long, Result) = {
    val collector = new StreamingCollector(outDir, Long.MaxValue)
    val cq = collector.start(new RateTweetSource(collectorRate).stream(spark))
    val cSoak = soak(cq, soakMs)

    // event-shaped stream for the stateful hourly aggregate (update mode:
    // windows stay open while event time is near now, but every input row
    // still flows through the stateful hash aggregate)
    val types = array(Seq("view", "click", "purchase", "signup", "error").map(lit): _*)
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", eventsRate.toString).load()
      .select(col("value").as("event_id"),
        element_at(types, (col("value") % 5 + 1).cast("int")).as("event_type"),
        col("timestamp").as("ts"),
        (col("value") % 100).cast("double").as("value"))
    val hq = EventStreams.hourlyTypeCounts(events).writeStream
      .outputMode("update").format("noop").start()
    val hSoak = soak(hq, soakMs)
    (cSoak, collector.collected, hSoak)
  }
}
