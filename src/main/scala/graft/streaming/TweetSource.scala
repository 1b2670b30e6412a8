package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.tweets.TweetSchema

/** Replayable tweet-status source abstraction (SURVEY.md §2.1 S1).
  *
  * The reference's source is a receiver-based Twitter DStream
  * (TwitterStreamingCollector.scala:71) against an API that no longer exists,
  * so replayability is first-class here: every implementation yields a
  * *streaming* DataFrame with the nested `TweetSchema.statusStruct` shape
  * (`text, user.lang, geo.{latitude,longitude}, created_at`), and the rest of
  * the pipeline is source-agnostic.
  *
  * Implementations:
  *  - file JSON source ([[FileTweetSource]]) — fixture replay; this is what a
  *    production re-ingest from an archived firehose dump looks like, and it
  *    scales: each executor reads its own file slice, `maxFilesPerTrigger`
  *    bounds batch size.
  *  - `MemoryStream[TweetStatus]` — test-side (constructed directly in specs;
  *    needs the session's `implicits`, so it lives with the tests).
  *  - rate source ([[RateTweetSource]]) — synthetic load generation.
  *
  * A full DataSource V2 `MicroBatchStream` connector is intentionally out of
  * scope: capability parity needs replay, not a dead API's wire protocol.
  */
trait TweetSource {
  def stream(spark: SparkSession): DataFrame
}

/** JSON-lines fixture replay with the declared status schema (never inferred).
  * @param maxFilesPerTrigger bounds micro-batch size on large replays
  */
final class FileTweetSource(dir: String, maxFilesPerTrigger: Option[Int] = None)
    extends TweetSource {
  override def stream(spark: SparkSession): DataFrame = {
    val r = spark.readStream.schema(TweetSchema.statusStruct)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n)).json(dir)
  }
}

/** Synthetic status stream off the built-in rate source (load tests): rows/sec
  * controlled upstream, text cycles through the track keywords so downstream
  * filters see realistic selectivity.
  */
final class RateTweetSource(rowsPerSecond: Int) extends TweetSource {
  override def stream(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val kws = TweetSchema.trackKeywords
    val kwArray = array(kws.map(lit): _*)
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(
        concat(lit("tweet "), col("value"), lit(" "),
          element_at(kwArray, (col("value") % kws.size + 1).cast("int")))
          .as("text"),
        struct(lit("fr").as("lang")).as("user"),
        struct((col("value") % 90).cast("double").as("latitude"),
          (col("value") % 180).cast("double").as("longitude")).as("geo"),
        col("timestamp").as("created_at"))
  }
}
