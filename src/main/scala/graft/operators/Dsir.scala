package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols._

/** DSIR-style data selection — importance weighting of a raw corpus toward a
  * target domain (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): fit unigram bag-of-words models over a TARGET
  * slice and the RAW remainder, score every document by its log importance
  * ratio Σ_t cnt_doc(t)·[log p̂_target(t) − log p̂_raw(t)] (add-one
  * smoothing), and keep the top of the ranking. The published method hashes
  * n-grams into a fixed bucket count to bound the feature table; the fixture
  * tier keeps exact tokens — auditable, and the table is vocabulary-sized —
  * with the hashed form being the same plan over `xxhash64(token) % B`
  * (the [[Decontamination.contaminationPairsOf]] fallback pattern).
  *
  * Cross-engine exactness: the per-feature log-ratios are computed ONCE (the
  * only transcendental step) and quantized to integer MICROS in a dumped
  * feature table; every per-document weight is then a BIGINT dot product
  * Σ cnt·ratio_micros — order-independent, so the DuckDB twin replays it
  * bit-for-bit from the dump (the [[graft.ml.QualityClassifier]] /
  * token_rarity contract: model lands in the dump, arithmetic is checked).
  *
  * Scale shape: one wordcount (map-side partials absorb token skew; result
  * is vocabulary-sized) whose totals reduce to three scalars; the ratio
  * table broadcasts BACK against the per-doc token counts — the corpus side
  * shuffles once on doc_id for its own rollup and never on the token (the
  * [[TextAnalysis.tfidfTopTerms]] topology).
  */
object Dsir {

  /** Per-token feature table over any (doc_id, text) frame: target/raw
    * counts and the add-one-smoothed log importance ratio in integer
    * micros. `isTarget` marks target-domain rows. */
  def tokenRatiosOf(docs: DataFrame, isTarget: Column): DataFrame = {
    val ex = spread(docs)
      .select(isTarget.as("is_t"),
        explode(TextAnalysis.tokens($"text")).as("token"))
    val counts = ex.groupBy($"token").agg(
      sum(when($"is_t", 1L).otherwise(0L)).as("target_cnt"),
      sum(when(!$"is_t", 1L).otherwise(0L)).as("raw_cnt"))
    // three scalars: total target tokens, total raw tokens, vocab size
    val t = counts.agg(sum($"target_cnt"), sum($"raw_cnt"), count(lit(1))).head()
    val (tT, tR, v) = (t.getLong(0), t.getLong(1), t.getLong(2))
    counts.withColumn("ratio_micros",
      round((log(($"target_cnt" + 1).cast("double") / (tT + v).toDouble) -
        log(($"raw_cnt" + 1).cast("double") / (tR + v).toDouble)) * 1e6, 0)
        .cast("long"))
  }

  /** The fixture target domain: French-tagged documents (the same kind of
    * "small curated target vs big raw pool" split DSIR is run with). */
  private def fixtureRatios(spark: SparkSession, sfDir: String): DataFrame =
    tokenRatiosOf(Tables.documents(spark, sfDir), $"lang" === "fr")

  /** Registered dump (it IS the oracle input): token, target_cnt, raw_cnt,
    * ratio_micros. */
  def tokenRatios(spark: SparkSession, sfDir: String): DataFrame =
    fixtureRatios(spark, sfDir)

  /** Per-document importance weights: BIGINT Σ cnt·ratio_micros over the
    * document's tokens (every corpus token is in the vocabulary by
    * construction), plus the token count. Tokenless docs yield no row —
    * the doc_chunks convention. */
  def docWeightsOf(docs: DataFrame, ratios: DataFrame): DataFrame = {
    val perDocTok = spread(docs)
      .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("token"))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("cnt"))
    perDocTok
      .join(broadcast(ratios.select($"token", $"ratio_micros")), "token")
      .groupBy($"doc_id")
      .agg(sum($"cnt").as("n_tokens"),
        sum($"cnt" * $"ratio_micros").as("weight_micros"))
      .select($"doc_id", $"n_tokens", $"weight_micros")
  }

  /** Registered query: every document's importance weight toward the
    * French target slice. */
  def docWeights(spark: SparkSession, sfDir: String): DataFrame =
    docWeightsOf(Tables.documents(spark, sfDir), fixtureRatios(spark, sfDir))

  /** Registered query: the selection itself — global top-`k` documents by
    * importance weight (doc_id tiebreak). The cut is TakeOrderedAndProject
    * (never a global sort); the rank is a window over the ALREADY-cut k
    * rows, so no per-partition funnel exists at any scale. */
  def topWeighted(spark: SparkSession, sfDir: String, k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docWeights(spark, sfDir)
      .orderBy($"weight_micros".desc, $"doc_id")
      .limit(k)
      .withColumn("rk", row_number().over(Window.orderBy(
        $"weight_micros".desc, $"doc_id")).cast("long"))
  }
}
