package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.tweets.TweetSchema

/** Batch table loaders over the driver fixtures and the reference's
  * pipe-delimited interchange format (SURVEY.md §2.1 S4).
  *
  * All readers declare schemas explicitly — the reference never infers
  * (SURVEY.md §1.3) and neither do we: on a 100 TB lake, schema inference is
  * an extra full scan.
  */
object Tables {

  /** Parquet fixture table (columnar; scans get pushdown + pruning free). */
  def parquet(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = parquet(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = parquet(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = parquet(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = parquet(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = parquet(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = parquet(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = parquet(spark, sfDir, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read nanos as raw long (SPARK-40819 legacy
    * flag, set by every session builder — Verify, Bench, SparkTestBase — not
    * mutated here: a loader changing session config is a call-order-dependent
    * side effect) and floor-divide to micros — integer `div`, NOT `/`: a
    * ns-epoch (~1.7e18) exceeds double's 2^53 exact-integer range, so float
    * division would corrupt timestamps.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    parquet(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  def documents(spark: SparkSession, sfDir: String): DataFrame = parquet(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = parquet(spark, sfDir, "embeddings")

  /** The reference's external table: pipe-delimited text with the declared
    * 4-column tweet schema (README.md:98-101). Spark's CSV reader turns ""
    * into NULL for the FLOAT columns, matching the Hive behavior the
    * reference relies on via Option[Float] (README.md:135).
    */
  def tweetText(spark: SparkSession, dir: String,
      schema: StructType = TweetSchema.struct): DataFrame =
    spark.read
      .schema(schema)
      .option("sep", TweetSchema.separator)
      .option("timestampFormat", TweetSchema.timestampPattern)
      .csv(dir)

  /** Register the tweet table under the reference's name so all README SQL
    * runs verbatim through spark.sql (README.md:105-126). */
  def registerTwitterPresi(spark: SparkSession, dir: String): Unit =
    tweetText(spark, dir).createOrReplaceTempView("twitter_presi")

  /** Persist a frame bucketed (and sorted) by a join key. Joins between
    * tables bucketed the same way on the same key read co-located — no
    * shuffle on either side (asserted by BucketingSpec). This is the
    * pre-pay-the-shuffle-once scale path for fact⋈fact joins that recur on
    * one key (e.g. lineitem⋈orders at 100 TB): every subsequent join is a
    * per-bucket sort-merge with zero exchanges.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
}
