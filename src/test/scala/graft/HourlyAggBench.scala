package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{EventStreams, Soak}

/** Scratch microbench (test scope, not a recorded artifact): decompose the
  * hourly_type_counts soak — is the thin margin the stateful aggregation
  * (state-store commits) or the rate-source feed itself? Rows/sec for:
  * (a) the synthetic feed into a noop sink (no agg at all),
  * (b) the full watermarked windowed agg (HDFS-backed state store),
  * (c) the same agg on the RocksDB state store provider.
  */
object HourlyAggBench {
  def main(args: Array[String]): Unit = {
    val rate = args.headOption.map(_.toInt).getOrElse(1600000)
    def session(extra: Map[String, String]) = {
      val b = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.codegen.cache.maxEntries", "10000")
      extra.foreach { case (k, v) => b.config(k, v) }
      b.getOrCreate()
    }
    def feed(spark: SparkSession) = {
      val types = array(Seq("view", "click", "purchase", "signup", "error").map(lit): _*)
      spark.readStream.format("rate")
        .option("rowsPerSecond", rate.toString).load()
        .select(col("value").as("event_id"),
          element_at(types, (col("value") % 5 + 1).cast("int")).as("event_type"),
          col("timestamp").as("ts"),
          (col("value") % 100).cast("double").as("value"))
    }
    def run(label: String, extra: Map[String, String])(
        q: SparkSession => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val spark = session(extra)
      spark.sparkContext.setLogLevel("WARN")
      val res = Soak.soak(q(spark), 10000)
      println(s"$label: ${Soak.json(res)}")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    run("feed-only", Map.empty) { spark =>
      feed(spark).writeStream.outputMode("append").format("noop").start()
    }
    run("hourly-hdfs", Map.empty) { spark =>
      EventStreams.hourlyTypeCounts(feed(spark)).writeStream
        .outputMode("update").format("noop").start()
    }
    run("hourly-rocksdb", Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) { spark =>
      EventStreams.hourlyTypeCounts(feed(spark)).writeStream
        .outputMode("update").format("noop").start()
    }
    run("hourly-4s-trigger", Map.empty) { spark =>
      EventStreams.hourlyTypeCounts(feed(spark)).writeStream
        .outputMode("update").format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("4 seconds"))
        .start()
    }
    run("hourly-fewer-state-parts", Map(
      "spark.sql.shuffle.partitions" -> "8")) { spark =>
      EventStreams.hourlyTypeCounts(feed(spark)).writeStream
        .outputMode("update").format("noop").start()
    }
  }
}
