package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols._

/** Mergeable cardinality sketches (builder-brief extension; no reference
  * analogue). Per-source distinct-token counting is the canonical place a
  * 100 TB pipeline swaps exact distinct for a sketch: the exact form
  * shuffles every (source, token) pair once to dedup them, while the
  * DataSketches HLL form ([SPARK-16484] `hll_sketch_agg`) reduces each
  * partition to a fixed 2^lgK-register sketch and merges — shuffle bytes
  * drop from O(distinct tokens) to O(partitions × 2^lgK), and the SAME
  * sketches persist per shard and union incrementally as the corpus grows
  * (yesterday's shards are never rescanned). The estimate is within
  * ~1.6% rsd at lgK=12; SketchesSpec pins both the accuracy band and the
  * exact merge identity (per-shard sketches unioned == one-pass sketch).
  */
object Sketches {

  private def sourceTokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select($"source", explode(TextAnalysis.tokens($"text")).as("tok"))

  /** Registered query (exact anchor): distinct tokens per source. */
  def sourceTokenCardinality(spark: SparkSession, sfDir: String): DataFrame =
    sourceTokens(spark, sfDir)
      .groupBy($"source")
      .agg(countDistinct($"tok").as("n_distinct_tokens"))
      .orderBy($"source")

  /** Registered query (sketch tier, rows-only): the HLL estimate of the
    * same rollup. lgK = 12 → 4 KiB per sketch regardless of corpus size. */
  def sourceTokenCardinalityHll(spark: SparkSession, sfDir: String,
      lgK: Int = 12): DataFrame =
    sourceTokens(spark, sfDir)
      .groupBy($"source")
      .agg(expr(s"hll_sketch_estimate(hll_sketch_agg(tok, $lgK))")
        .as("n_distinct_tokens_est"))
      .orderBy($"source")

  /** The incremental path: per-shard sketches (what a daily job persists)
    * unioned into the per-source totals. Estimates are EXACTLY equal to
    * [[sourceTokenCardinalityHll]]'s — HLL register merge is max(), which
    * is associative/commutative — so sharded accumulation loses nothing. */
  def sourceTokenCardinalitySharded(spark: SparkSession, sfDir: String,
      lgK: Int = 12, nShards: Int = 8): DataFrame =
    sourceTokens(spark, sfDir)
      .withColumn("shard", Sampling.shardOf($"tok", nShards))
      .groupBy($"source", $"shard")
      .agg(expr(s"hll_sketch_agg(tok, $lgK)").as("sk"))
      .groupBy($"source")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")
        .as("n_distinct_tokens_est"))
      .orderBy($"source")
}
