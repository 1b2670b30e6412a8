package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions
import graft.sources.Tables
import graft.util.Cols._

/** CCNet-style language-model quality scoring (Wenzek et al. 2020, "CCNet:
  * Extracting high quality monolingual datasets from web crawl data"): train
  * a small LM on a high-quality REFERENCE corpus, score every candidate
  * document by its per-token negative log-likelihood, and gate/bucket on the
  * score — the most widely used quality filter in published pre-training
  * pipelines (CCNet, RedPajama, many others). CCNet uses a KenLM 5-gram; the
  * relational tier here is a bigram model with add-one smoothing — the same
  * operator shape (train once on the small reference, score the corpus in
  * place), with every probability a closed-form count ratio so the whole
  * model is dumpable and the scoring replayable.
  *
  * Cross-engine exactness (the [[Dsir]] / quality-classifier contract): the
  * transcendental step — ln of the smoothed ratios — happens ONCE, at
  * training, and lands in the dumped model tables quantized to integer
  * micros. A document's NLL is then a BIGINT sum of dump values; the mean is
  * ONE final division of exact integers (+1e-9 nudge, 6-dp round), so the
  * DuckDB twin is bit-for-bit.
  *
  * Scale shape: the reference corpus is small BY DESIGN (CCNet's is
  * Wikipedia), so both model tables broadcast; candidate documents explode
  * to positional bigrams via the native codegen [[TextExpressions
  * .tokenNgramsPos]] and probe the broadcast tables in place — the corpus
  * never shuffles on a gram, and the per-doc rollup's map-side partials
  * collapse rows that never left their scan partition.
  */
object NgramLm {

  /** Trained bigram model as two micros-quantized tables.
    *
    * `bigrams`: (gram "u v", lp_micros) — ln((c(u,v)+1)/(c(u)+V)).
    * `contexts`: (context u, def_micros) — ln(1/(c(u)+V)), the logprob of
    * any UNSEEN continuation of a seen context; plus one marker row
    * (context = "", the tokenizer never yields an empty token) carrying the
    * global default ln(1/V) for unseen contexts, so the dump is
    * self-contained for the oracle replay.
    * `globalDefMicros`: the same global default as a driver value.
    */
  final case class BigramModel(bigrams: DataFrame, contexts: DataFrame,
      globalDefMicros: Long)

  /** Fit the add-one bigram model over a (doc_id, text) reference frame.
    * V counts the reference vocabulary plus one unknown slot. */
  def fit(reference: DataFrame): BigramModel = {
    val toks = spread(reference)
      .select(explode(TextExpressions.tokenNgramsPos(
        coalesce($"text", lit("")), 1)).as("token"))
    // lineage-cut, not persist: the unigram table (vocab-sized) has THREE
    // consumers — the v count, the bigram-logprob join, and the defaults
    // table — and the previous persist was unpersisted before the model
    // tables ever executed (they are returned as plans), so every consumer
    // re-ran the reference tokenize pass. localCheckpoint materializes it
    // once with no lifecycle to get wrong; reliable checkpoint on a cluster.
    val uni = toks.groupBy($"token").agg(count(lit(1)).as("c_u"))
      .localCheckpoint()
    val v = uni.count() + 1
      val bi = spread(reference)
        .select(explode(TextExpressions.tokenNgramsPos(
          coalesce($"text", lit("")), 2)).as("gram"))
        .groupBy($"gram").agg(count(lit(1)).as("c_uv"))
        .withColumn("context", substring_index($"gram", " ", 1))
      val lp = bi
        .join(broadcast(uni.withColumnRenamed("token", "context")), "context")
        .select($"gram",
          round(log(($"c_uv" + 1).cast("double") /
            ($"c_u" + v).cast("double")) * 1e6, 0).cast("long").as("lp_micros"))
      val defaults = uni.select($"token".as("context"),
          round(log(lit(1.0) / ($"c_u" + v).cast("double")) * 1e6, 0)
            .cast("long").as("def_micros"))
      val globalDef = math.round(math.log(1.0 / v) * 1e6)
      val contexts = defaults.unionByName(
        reference.sparkSession.range(1).select(lit("").as("context"),
          lit(globalDef).as("def_micros")))
      BigramModel(lp, contexts, globalDef)
  }

  /** The fixture reference corpus: the English-tagged slice (the "train on
    * the high-quality reference language" CCNet setup). */
  private def fixtureModel(spark: SparkSession, sfDir: String): BigramModel =
    fit(Tables.documents(spark, sfDir).filter($"lang" === "en")
      .select($"doc_id", $"text"))

  /** Registered dump (it IS the oracle input): the bigram logprob table. */
  def bigramLogprobs(spark: SparkSession, sfDir: String): DataFrame =
    fixtureModel(spark, sfDir).bigrams

  /** Registered dump (it IS the oracle input): per-context unseen-
    * continuation defaults + the "" global-default marker row. */
  def unigramDefaults(spark: SparkSession, sfDir: String): DataFrame =
    fixtureModel(spark, sfDir).contexts

  /** Score any (doc_id, text) frame under a fitted model: positional
    * bigrams probe the broadcast tables (bigram hit → context default →
    * global default), NLL sums the negated micros. Docs with fewer than two
    * tokens yield no row (no bigram evidence — the doc_chunks convention).
    */
  def scoreOf(docs: DataFrame, model: BigramModel): DataFrame = {
    val oc = spread(docs)
      .select($"doc_id", explode(TextExpressions.tokenNgramsPos(
        coalesce($"text", lit("")), 2)).as("gram"))
      .withColumn("context", substring_index($"gram", " ", 1))
    oc
      .join(broadcast(model.bigrams), Seq("gram"), "left")
      .join(broadcast(model.contexts.filter($"context" =!= "")),
        Seq("context"), "left")
      .withColumn("lp", coalesce($"lp_micros", $"def_micros",
        lit(model.globalDefMicros)))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(-$"lp").as("nll_micros"))
      .select($"doc_id", $"n_bigrams", $"nll_micros",
        round($"nll_micros".cast("double") /
          (lit(1000000.0) * $"n_bigrams") + 1e-9, 6).as("mean_nll"))
  }

  /** Registered query: every document's NLL under the English-reference
    * bigram model — low mean_nll reads as "fluent under the reference
    * distribution", the CCNet quality axis. */
  def perplexityScores(spark: SparkSession, sfDir: String): DataFrame =
    scoreOf(Tables.documents(spark, sfDir).select($"doc_id", $"text"),
      fixtureModel(spark, sfDir))
}
