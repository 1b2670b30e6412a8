package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{EventStreams, RateTweetSource, StreamingCollector}

/** Streaming throughput soak (VERDICT r4 #6): drive the rate source through
  * the two always-on pipelines — the collection sink and the watermarked
  * windowed aggregation — for a few seconds each, record rows/sec and batch
  * latency to STREAMBENCH.json, and pin a non-degenerate throughput floor.
  *
  * Rates are set well above the floor so a pass means the pipeline KEPT UP,
  * not merely ran: the collector must sustain ≥5k lines/sec of processing
  * throughput (filter → sanitize → per-batch text sink) and the stateful
  * hourly aggregation ≥20k events/sec, on the 4-core test session. The
  * driver's bench box has 8× the cores; the floors are deliberately
  * conservative so CI noise cannot flake them.
  */
class StreamingSoakSpec extends SparkTestBase {

  private case class Soak(totalRows: Long, batches: Int, rowsPerSec: Long,
      meanBatchMs: Long, maxBatchMs: Long)

  /** Let the query soak, then summarize its non-empty micro-batches:
    * processing throughput (rows over trigger-execution time, idle waits
    * excluded) and batch latency. */
  private def soak(q: StreamingQuery, soakMs: Long): Soak = {
    Thread.sleep(soakMs)
    // stop FIRST, then snapshot: a micro-batch completing between a
    // progress snapshot and stop() would be sunk but unreported, breaking
    // any rows-accounting against the sink
    q.stop()
    q.awaitTermination()
    val progress = q.recentProgress.toSeq
    val busy = progress.filter(_.numInputRows > 0)
    val durs = busy.map(_.durationMs.get("triggerExecution").toLong)
    val rows = busy.map(_.numInputRows).sum
    val durMs = math.max(durs.sum, 1L)
    Soak(rows, busy.size, rows * 1000L / durMs,
      if (busy.isEmpty) 0L else durs.sum / busy.size, (0L +: durs).max)
  }

  private def json(s: Soak): String =
    s"""{"total_rows":${s.totalRows},"batches":${s.batches},""" +
      s""""rows_per_sec":${s.rowsPerSec},"mean_batch_ms":${s.meanBatchMs},""" +
      s""""max_batch_ms":${s.maxBatchMs}}"""

  test("rate-source soak: collector and hourly aggregation sustain load; numbers recorded") {
    // 1) collection pipeline: track filter → lang filter → sanitize → text sink
    val out = Files.createTempDirectory("graft-soak-collector")
    out.toFile.deleteOnExit()
    val collector = new StreamingCollector(out.toString, Long.MaxValue)
    val cq = collector.start(new RateTweetSource(50000).stream(spark))
    val cSoak = soak(cq, 8000)

    // 2) watermarked tumbling-window aggregation over an event-shaped stream
    // (update mode: windows stay open while event time is near now, but every
    // input row still flows through the stateful hash aggregate)
    val types = array(Seq("view", "click", "purchase", "signup", "error").map(lit): _*)
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", "200000").load()
      .select(col("value").as("event_id"),
        element_at(types, (col("value") % 5 + 1).cast("int")).as("event_type"),
        col("timestamp").as("ts"),
        (col("value") % 100).cast("double").as("value"))
    val hq = EventStreams.hourlyTypeCounts(events).writeStream
      .outputMode("update").format("noop").start()
    val hSoak = soak(hq, 8000)

    Files.writeString(Paths.get("STREAMBENCH.json"),
      s"""{"collector":${json(cSoak)},"hourly_type_counts":${json(hSoak)},""" +
        s""""cores":4,"collector_rate":50000,"events_rate":200000}\n""")

    assert(cSoak.batches >= 2 && cSoak.totalRows > 20000, cSoak)
    assert(cSoak.rowsPerSec > 5000, s"collector throughput degenerate: $cSoak")
    // >= not ==: recentProgress is a BOUNDED buffer (default 100 entries),
    // so on a fast machine early batches silently age out of totalRows;
    // every reported row must still have reached the sink
    assert(collector.collected >= cSoak.totalRows, (collector.collected, cSoak))
    assert(hSoak.batches >= 2 && hSoak.totalRows > 50000, hSoak)
    assert(hSoak.rowsPerSec > 20000, s"agg throughput degenerate: $hSoak")
  }
}
