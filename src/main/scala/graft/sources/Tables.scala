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
  /** events.ts has shipped under multiple encodings across fixture
    * generations: parquet TIMESTAMP(NANOS) — which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]) unless the SPARK-40819 legacy flag reads it as
    * raw long — and plain timestamp[us] without timezone, which Spark loads
    * as TimestampNTZType. Branch on the *loaded* dtype rather than assuming
    * any one generation:
    *   - LongType → the legacy-nanos path: floor-divide to micros (integer
    *     `div`, NOT `/`: a ns-epoch ~1.7e18 exceeds double's 2^53
    *     exact-integer range and float division would corrupt timestamps);
    *   - TimestampNTZType → cast to TimestampType; with the session timezone
    *     pinned to UTC (every session builder — Verify, Bench,
    *     SparkTestBase — does) this is value-preserving and matches DuckDB's
    *     naive-timestamp read of the same file;
    *   - TimestampType → pass through.
    * Anything else fails with one loud diagnostic instead of 13 scattered
    * DATATYPE_MISMATCH errors downstream. The legacy flag itself is never
    * mutated here: a loader changing session config is a
    * call-order-dependent side effect.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = parquet(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", raw("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts: expected LongType (legacy nanos), TimestampNTZType, or TimestampType, got $other")
    }
  }
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
