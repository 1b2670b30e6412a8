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
  /** HASH-CHECKED error envelope for the HLL tier (see
    * [[graft.operators.Relational.distinctPartsEnvelope]] for the
    * pattern): exact per-source distinct-token counts plus a boolean
    * asserting the lgK=12 estimate lands within `tol` (a 5σ band at
    * rsd ≈ 1.6%, plus one unit of slack for tiny groups). DuckDB replays
    * the exact side and a literal TRUE; HLL drift flips the boolean and
    * the hash goes red. The estimate stays a DOUBLE comparison — rounding
    * it to a long first could mask a boundary drift.
    */
  def sourceTokenCardinalityEnvelope(spark: SparkSession, sfDir: String,
      lgK: Int = 12, tol: Double = 0.08): DataFrame = {
    val exact = sourceTokenCardinality(spark, sfDir)
    val est = sourceTokenCardinalityHll(spark, sfDir, lgK)
    exact.join(broadcast(est), "source")
      .select($"source", $"n_distinct_tokens",
        (abs($"n_distinct_tokens_est" - $"n_distinct_tokens") <=
          lit(tol) * $"n_distinct_tokens" + 1).as("within_tol"))
      .orderBy($"source")
  }

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
