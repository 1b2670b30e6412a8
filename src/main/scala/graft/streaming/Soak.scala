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
