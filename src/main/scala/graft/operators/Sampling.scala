package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols._

/** Reproducible sampling for corpus builds (builder-brief extension; no
  * reference analogue). `df.sample()` draws from a partition-seeded RNG —
  * resample-stable only for a fixed partitioning, and not reproducible by
  * any other engine. The hash-gate form is: keep a row iff the first 8 hex
  * chars of `md5(key)` fall below a threshold encoding the fraction. That
  * makes the sample a pure function of the KEY — stable under repartition,
  * re-runs, engine ports (the DuckDB oracle evaluates the identical
  * predicate), and incremental loads (a row's membership never changes),
  * which is what a training-data pipeline needs from a holdout split.
  *
  * Scale: a narrow filter, no shuffle, fully pushed into the scan stage;
  * selectivity is uniform because md5 is. Correlated sampling (same key →
  * same decision across tables) falls out of keying both tables the same
  * way — the join-safe sampling trick.
  */
object Sampling {

  /** 8-hex-digit threshold encoding `fraction` of the 16^8 hash space.
    * fraction = 1.0 returns "g", which sorts after every hex string, so
    * the gate keeps all rows (a numeric 2^32 threshold would need 9 chars
    * and break the fixed-width comparison). */
  private[graft] def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    val units = math.round(fraction * 0x100000000L) // 16^8 = 2^32
    if (units >= 0x100000000L) "g" else f"$units%08x"
  }

  /** Keep rows whose key hashes under `fraction` (deterministic). */
  def hashGate(key: Column, fraction: Double): Column =
    substring(md5(key.cast("string")), 1, 8) < lit(thresholdHex(fraction))

  /** Deterministic train/val/test assignment — the holdout-split staple:
    * the first 8 hex chars of md5(key) place every document in exactly one
    * band (train < valThr ≤ val < testThr ≤ test), so splits are DISJOINT
    * and EXHAUSTIVE by construction, stable under repartition/re-runs, and
    * a document never migrates between splits as the corpus grows (the
    * property that keeps eval sets uncontaminated across releases).
    * Fractions are (1−valFrac−testFrac, valFrac, testFrac). */
  def holdoutSplit(key: Column, valFrac: Double = 0.01,
      testFrac: Double = 0.01): Column = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac <= 1.0)
    val h = substring(md5(key.cast("string")), 1, 8)
    when(h < lit(thresholdHex(1.0 - valFrac - testFrac)), "train")
      .when(h < lit(thresholdHex(1.0 - testFrac)), "val")
      .otherwise("test")
  }

  /** Registered query: per-document split assignment plus the per-split
    * size/token audit a release pipeline reports. */
  def corpusSplits(spark: SparkSession, sfDir: String, valFrac: Double = 0.05,
      testFrac: Double = 0.05): DataFrame =
    Tables.documents(spark, sfDir)
      .select($"doc_id",
        holdoutSplit($"doc_id", valFrac, testFrac).as("split"),
        size(TextAnalysis.tokens($"text")).cast("long").as("n_tokens"))

  /** [[hashGate]] with a DATA-DERIVED rate column: the threshold is built
    * in-plan from the rate (round(rate·16^8) as 8 lowercase hex chars;
    * ≥ 16^8 units → "g", the keep-everything sentinel of [[thresholdHex]]).
    * Same determinism contract — membership is a pure function of
    * (key, rate) that any engine reproduces. */
  def dynamicHashGate(key: Column, rate: Column): Column = {
    val units = round(rate * lit(4294967296.0)).cast("long")
    val thr = when(units >= 4294967296L, lit("g"))
      .otherwise(lpad(lower(hex(units)), 8, "0"))
    substring(md5(key.cast("string")), 1, 8) < thr
  }

  /** Corpus MIXING — the sampling step of an LLM data pipeline that the
    * fixed-rate [[stratifiedSample]] can't express: given per-language
    * TOKEN budgets, derive each language's keep-rate from the data
    * (rate = min(1, budget / actual tokens)) and gate documents
    * deterministically at that rate. Languages without a budget (or whose
    * budget exceeds their actual tokens) keep everything; oversupplied
    * languages are downsampled toward their budget in expectation —
    * quota-mixing a 100-language corpus to a target composition is exactly
    * this query at 1000× the group count.
    *
    * Scale: one hash-agg over (lang) for totals (tiny result), rates
    * broadcast back, then a per-row gate — the corpus itself never
    * shuffles. Fully oracle-checked: totals, rates, threshold hex, and the
    * md5 gate are all re-derived by DuckDB from the same table.
    */
  def corpusMixture(spark: SparkSession, sfDir: String,
      budgets: Map[String, Long] = Map("en" -> 5000L, "fr" -> 2000000000L))
      : DataFrame =
    corpusMixtureOf(Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang",
        size(TextAnalysis.tokens($"text")).cast("long").as("n_tokens")),
      budgets)

  /** Core of [[corpusMixture]] over any (doc_id, lang, n_tokens) frame —
    * also the batch twin the streaming annealed mixture
    * ([[graft.streaming.SampleStream.annealedMixtureQuery]]) is
    * parity-pinned against. */
  def corpusMixtureOf(docs: DataFrame,
      budgets: Map[String, Long]): DataFrame = {
    val spark = docs.sparkSession
    val totals = docs.groupBy($"lang")
      .agg(sum($"n_tokens").as("lang_tokens"))
      .filter($"lang_tokens" > 0)
    val budgetDf = spark.createDataFrame(budgets.toSeq).toDF("lang", "budget")
    val rates = totals.join(broadcast(budgetDf), Seq("lang"), "left")
      .select($"lang", least(lit(1.0),
        coalesce($"budget", $"lang_tokens").cast("double") /
          $"lang_tokens".cast("double")).as("rate"))
    docs.join(broadcast(rates), "lang")
      .filter(dynamicHashGate($"doc_id", $"rate"))
      .select($"doc_id", $"lang", $"n_tokens")
  }

  /** Corpus mixing with UPSAMPLING — [[corpusMixture]] generalized to
    * budgets above a language's actual supply: ratio = budget / actual
    * tokens, each document appears in floor(ratio) full epochs plus one
    * fractional epoch gated at rate (ratio − floor) — the epoch-repeat
    * scheme LLM data pipelines use to hit a target composition when a
    * language is under-represented. A language without a budget gets
    * exactly one ungated epoch; a downsampled language (ratio < 1) gets
    * zero full epochs and only the gated one, reducing to
    * [[corpusMixture]]'s semantics. Output grain: (doc_id, epoch).
    *
    * Scale: the explode multiplies only by each language's epoch count
    * (that IS the requested output), rates broadcast, corpus unshuffled —
    * and the whole derivation (totals, ratio, floor/frac split, gate) is
    * replayed by the DuckDB oracle.
    */
  def corpusMixtureEpochs(spark: SparkSession, sfDir: String,
      budgets: Map[String, Long] = Map("en" -> 5000L, "de" -> 8000L))
      : DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang",
        size(TextAnalysis.tokens($"text")).cast("long").as("n_tokens"))
    val totals = docs.groupBy($"lang")
      .agg(sum($"n_tokens").as("lang_tokens"))
      .filter($"lang_tokens" > 0)
    val budgetDf = spark.createDataFrame(budgets.toSeq).toDF("lang", "budget")
    val rates = totals.join(broadcast(budgetDf), Seq("lang"), "left")
      .select($"lang",
        (coalesce($"budget", $"lang_tokens").cast("double") /
          $"lang_tokens".cast("double")).as("ratio"))
      .select($"lang", floor($"ratio").cast("long").as("full_epochs"),
        ($"ratio" - floor($"ratio")).as("frac"))
    docs.join(broadcast(rates), "lang")
      .select($"doc_id", $"lang", $"n_tokens", $"full_epochs", $"frac",
        explode(sequence(lit(1L), $"full_epochs" + 1L)).as("epoch"))
      .filter($"epoch" <= $"full_epochs" || dynamicHashGate($"doc_id", $"frac"))
      .select($"doc_id", $"lang", $"n_tokens", $"epoch")
  }

  /** Temperature-scaled mixture weights — the multilingual-LM standard
    * (XLM-R / mT5 style): a language with token share p gets sampling
    * weight p^alpha / Σ p^alpha. alpha = 1 reproduces natural proportions;
    * alpha → 0 approaches uniform; the usual 0.3–0.7 band lifts
    * low-resource languages without drowning the head. Output is the
    * per-language release table: actual tokens, natural share, temperature
    * weight, the token target a `totalBudget`-token run would draw, and
    * the resulting keep/upsample ratio (target/actual — feeds
    * [[corpusMixtureEpochs]] as its budget map).
    *
    * Scale: one hash-agg over (lang) — the result is language-count-sized,
    * so the unpartitioned windows that normalize shares run over a
    * dashboard-sized frame, not the corpus. Doubles are rounded to 6
    * decimals AFTER each engine's own pow/sum so last-ulp libm drift
    * cannot flip the hash compare.
    */
  def mixtureTemperature(spark: SparkSession, sfDir: String,
      alpha: Double = 0.7, totalBudget: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    val totals = Tables.documents(spark, sfDir)
      .select($"lang", size(TextAnalysis.tokens($"text")).cast("long").as("n_tokens"))
      .groupBy($"lang").agg(sum($"n_tokens").as("lang_tokens"))
      .filter($"lang_tokens" > 0)
    totals
      .withColumn("share", $"lang_tokens".cast("double") /
        sum($"lang_tokens").over(all).cast("double"))
      .withColumn("pw", pow($"share", lit(alpha)))
      .withColumn("weight", round($"pw" / sum($"pw").over(all), 6))
      .withColumn("target_tokens",
        round($"weight" * lit(totalBudget.toDouble)).cast("long"))
      .select($"lang", $"lang_tokens", round($"share", 6).as("share"),
        $"weight", $"target_tokens",
        round($"target_tokens".cast("double") / $"lang_tokens".cast("double"), 6)
          .as("mix_ratio"))
      .orderBy($"lang")
  }

  /** Deterministic shard assignment: the first 8 hex chars of md5(key)
    * parsed as an integer, mod `nShards` — the same hash family as
    * [[hashGate]]/[[holdoutSplit]], so shard membership is a pure function
    * of the key: stable under repartition, re-runs, engine ports (DuckDB
    * evaluates the identical arithmetic), and incremental appends (a
    * document's shard never changes as the corpus grows — the property
    * that lets a training job address shard k of N without a manifest).
    */
  def shardOf(key: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 0xFFFF,
      s"nShards must be in [1, 65535], got $nShards") // 2^32/65535 keeps mod-bias < 0.002%
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % nShards
  }

  /** Registered query: the per-shard audit of a 16-way training-shard
    * layout — document count and token volume per shard (what a release
    * pipeline checks for balance before handing shards to trainers). One
    * per-row hash + one small hash-agg; the corpus never shuffles. */
  /** Registered query (HASH-CHECKED): the end-to-end TRAINING MANIFEST —
    * the dataloader contract that composes the pipeline's last three
    * stages: [[curriculumOrder]] picks WHICH docs each epoch sees and in
    * WHAT order (per-epoch quality gate, per-(epoch, shard) hash
    * reshuffle), the corpus token metric ([[corpusShards]]'s counter) says
    * how LONG each doc is, and [[graft.operators.TextAnalysis.packedSequences]]'s
    * packing rule (running token count, `div contextLen`) says which PACK
    * each doc lands in. One row per (epoch, doc) occurrence:
    * (epoch, shard, pack_id, pos, doc_id, n_tokens, start_tok, pack_off) —
    * a trainer walks (epoch, shard, pos) and fills context windows;
    * `start_tok div/mod contextLen` is exactly where the doc's tokens land.
    *
    * Conservation (pinned in SamplingSpec): every curriculum-selected doc
    * is packed EXACTLY once per epoch, and per (epoch, shard) the packed
    * token sum equals the docs' token sum — nothing dropped, nothing
    * duplicated, no pack overlaps.
    *
    * Scale: the curriculum already ends hash-ordered per (epoch, shard);
    * attaching n_tokens is one doc_id equi-join (in production the token
    * count rides along from the stats pass — the join exists here because
    * the chained entries are registered separately), and the running sum
    * is a per-(epoch, shard) window — the [[TextAnalysis.packedSequences]]
    * no-global-cumsum shape; nShards scales the window parallelism. */
  def trainingManifest(spark: SparkSession, sfDir: String, nEpochs: Int = 3,
      nShards: Int = 8, contextLen: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(contextLen >= 1)
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id",
        size(TextAnalysis.tokens($"text")).cast("long").as("n_tokens"))
    val w = Window.partitionBy($"epoch", $"shard").orderBy($"pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    curriculumOrder(spark, sfDir, nEpochs, nShards)
      .join(toks, "doc_id")
      .withColumn("start_tok", sum($"n_tokens").over(w) - $"n_tokens")
      .select($"epoch", $"shard", expr(s"start_tok div $contextLen").as("pack_id"),
        $"pos", $"doc_id", $"n_tokens", $"start_tok",
        ($"start_tok" % contextLen).as("pack_off"))
      .orderBy($"epoch", $"shard", $"pos")
  }

  def corpusShards(spark: SparkSession, sfDir: String,
      nShards: Int = 16): DataFrame =
    Tables.documents(spark, sfDir)
      .select(shardOf($"doc_id", nShards).as("shard"),
        size(TextAnalysis.tokens($"text")).cast("long").as("n_tokens"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"))
      .orderBy($"shard")

  /** The write path of the shard layout: co-locate each shard's documents
    * with `repartition(nShards, shard)` — ONE hash exchange, after which
    * every task holds complete shards — and write
    * `partitionBy("shard")` parquet. Because the exchange key equals the
    * directory key, each task writes at most its own shards' directories
    * (no small-file explosion: file count stays O(nShards), not
    * O(nShards × tasks)). Readers address `shard=k/` by partition pruning.
    */
  def writeTrainingShards(docs: DataFrame, path: String,
      nShards: Int = 16): Unit =
    docs.withColumn("shard", shardOf($"doc_id", nShards))
      .repartition(nShards, $"shard")
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Registered query: stratified deterministic sample of `documents` —
    * 25% of English, 50% of every other language (quota-balancing a
    * dominant stratum is the typical corpus-mix correction). */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(when($"lang" === "en", hashGate($"doc_id", 0.25))
        .otherwise(hashGate($"doc_id", 0.5)))
      .select($"doc_id", $"lang")

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * algorithm A-ES): each row draws priority u^(1/w) from a uniform u and
    * its weight w, and the global top-n by priority is EXACTLY a weighted
    * sample without replacement — the one-pass, shuffle-light way to draw
    * "n docs, longer docs proportionally likelier" from a 100 TB corpus.
    *
    * Determinism across engines (no RNG): u comes from the corpus-standard
    * md5 gate (first 8 hex chars → integer units; u = (units+1)/2³², in
    * (0,1] — exact in double, both engines see bit-identical u), and the
    * priority is compared as ln(u)/w (monotone in u^(1/w)) with ln
    * micro-quantized to an exact BIGINT (`round(ln(u)·1e6)`, the [[Bm25]]
    * convention) before the one IEEE division by w. Ties (incl. the
    * measure-zero quantization collisions) break by doc_id.
    *
    * Scale: a per-row projection, then global top-n = TakeOrdered (per
    * partition top-n, driver merges n·partitions rows) — the corpus never
    * shuffles; the rank window runs on the n collected survivors only. */
  def weightedSampleOf(docs: DataFrame, weight: Column, n: Int): DataFrame = {
    val units = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
      .cast("long")
    val lnMicros = round(
      log((units + 1).cast("double") / lit(4294967296.0)) * 1e6, 0)
      .cast("long")
    val scored = docs
      .select($"doc_id", weight.cast("long").as("weight"))
      .filter($"weight" > 0)
      .withColumn("ln_u_micros", lnMicros)
      .withColumn("priority", $"ln_u_micros".cast("double") / $"weight")
    val top = scored.orderBy($"priority".desc, $"doc_id").limit(n)
    // rank assignment over the n survivors only (tiny, post-TakeOrdered)
    top.withColumn("rk", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy($"priority".desc, $"doc_id")))
      .select($"rk", $"doc_id", $"weight", $"ln_u_micros")
  }

  /** Registered query: token-weighted A-ES top-100 over the fixture —
    * length-proportional sampling, the subsample shape a token-budget
    * ablation draws. Empty docs (weight 0) are excluded by contract
    * (u^(1/0) is undefined; a zero-weight row can never win). */
  def weightedSample(spark: SparkSession, sfDir: String,
      n: Int = 100): DataFrame =
    weightedSampleOf(Tables.documents(spark, sfDir),
      size(TextAnalysis.tokens($"text")).cast("long"), n)

  /** CURRICULUM training order (Bengio et al. 2009's easy-to-hard
    * schedule, quality-annealed): epoch 0 trains on the highest-quality
    * slice of the corpus, each later epoch WIDENS the pool, and the final
    * epoch sees everything — the anneal curriculum pipelines run so early
    * optimization steps meet clean data.
    *
    * Membership is a VALUE-level cutoff, not a rank: the per-epoch
    * threshold is the largest quality (exact 4-decimal micros) whose
    * cumulative-from-the-top count reaches `ceil(N·(e+1)/nEpochs)`,
    * derived on the driver from the quality HISTOGRAM (bounded by
    * construction: ≤ 20 001 distinct 4-decimal values no matter the corpus
    * size). Ties at the cutoff are included, so a document's epoch
    * membership is stable under corpus reordering and slices run at most
    * one tie-group over nominal. The final epoch's threshold is the
    * minimum quality — the whole corpus, by construction.
    *
    * Order within an epoch = the [[trainingOrder]] idiom: fixed md5
    * shards, per-(epoch, shard) md5 reshuffle, one windowed row_number per
    * (epoch, shard) slice — nothing global-sorts; the only driver data is
    * the histogram. Oracle: DuckDB replays histogram, cumulative
    * threshold, gate, and windows verbatim.
    */
  def curriculumOrder(spark: SparkSession, sfDir: String, nEpochs: Int = 3,
      nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nEpochs >= 1)
    val q = TextAnalysis.textStatsOf(Tables.documents(spark, sfDir))
      .select($"doc_id", round($"quality_score" * 10000).cast("long").as("qm"))
    val hist = q.groupBy($"qm").agg(count(lit(1)).as("c"))
      .orderBy($"qm".desc)
      .collect().map(r => (r.getLong(0), r.getLong(1))) // bounded (≤20k rows)
    val n = hist.map(_._2).sum
    val thresholds = (0 until nEpochs).map { e =>
      val target = (n * (e + 1) + nEpochs - 1) / nEpochs
      var cum = 0L
      var thr = hist.last._1
      val it = hist.iterator
      var found = false
      while (it.hasNext && !found) {
        val (v, c) = it.next(); cum += c
        if (cum >= target) { thr = v; found = true }
      }
      (e.toLong, thr)
    }
    val thrDf = spark.createDataFrame(thresholds).toDF("epoch", "thr")
    val h = md5(concat($"epoch".cast("string"), lit(":"), $"doc_id".cast("string")))
    q.join(broadcast(thrDf), $"qm" >= $"thr")
      .withColumn("shard", shardOf($"doc_id", nShards))
      .withColumn("__h", h)
      .withColumn("pos", row_number()
        .over(Window.partitionBy($"epoch", $"shard").orderBy($"__h", $"doc_id"))
        .cast("long"))
      .select($"epoch", $"shard", $"pos", $"doc_id", $"qm")
  }

  /** Registered query: deterministic multi-epoch training order — the
    * reproducible data-order contract a training run needs (resume from a
    * checkpoint, re-run a divergence, ablate data order — all demand the
    * exact same sequence every time, on any engine).
    *
    * Layout: shard membership is FIXED across epochs (the
    * [[writeTrainingShards]] md5 layout — readers keep data locality);
    * the READ ORDER within each (epoch, shard) reshuffles per epoch by
    * ordering on md5(epoch:doc_id). The global training order is
    * (epoch, shard-interleave, pos) — the standard shard-parallel reader.
    *
    * Scale: the only sort is `row_number` partitioned by (epoch, shard) —
    * each task orders one shard's slice; nothing ever global-sorts, and
    * position assignment parallelizes across epochs × shards. Oracle:
    * DuckDB replays hash, shard, and window verbatim.
    */
  def trainingOrder(spark: SparkSession, sfDir: String,
      nEpochs: Int = 2, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat($"epoch".cast("string"), lit(":"), $"doc_id".cast("string")))
    Tables.documents(spark, sfDir)
      .select($"doc_id", explode(sequence(lit(0), lit(nEpochs - 1))).as("epoch"))
      .withColumn("shard", shardOf($"doc_id", nShards))
      .withColumn("__h", h)
      .withColumn("pos", row_number()
        .over(Window.partitionBy($"epoch", $"shard").orderBy($"__h", $"doc_id"))
        .cast("long"))
      .select($"epoch".cast("long").as("epoch"), $"shard", $"pos", $"doc_id")
  }

  /** Registered query: per-event-type deterministic sample of k distinct
    * users via the [[graft.functions.Aggregators.BottomKByHash]] typed
    * Aggregator — a MERGEABLE partial aggregate (each task holds ≤ k
    * entries per group; the shuffle carries groups × k rows), where the
    * equivalent `row_number() OVER (ORDER BY md5(...))` window — which the
    * DuckDB oracle uses — must shuffle-sort every distinct pair first.
    * Same rows, partial-agg cost.
    */
  def sampledUsersPerType(spark: SparkSession, sfDir: String,
      k: Int = 8): DataFrame = {
    val sampler = udaf(new graft.functions.Aggregators.BottomKByHash(k))
    Tables.events(spark, sfDir)
      .select($"event_type", $"user_id")
      // explicit NULL gate: the aggregator skips nulls, so without this a
      // NULL user_id would appear in the oracle's window form (ranked
      // NULLS LAST) but never in the Spark output — aligned by excluding
      // it on BOTH sides (the oracle filters identically)
      .filter($"user_id".isNotNull)
      .distinct()
      .groupBy($"event_type")
      .agg(sampler($"user_id".cast("string")).as("sample"))
      .select($"event_type", posexplode($"sample").as(Seq("pos", "uid")))
      .select($"event_type", ($"pos" + 1).cast("long").as("rk"),
        $"uid".cast("long").as("user_id"))
      .orderBy($"event_type", $"rk")
  }

  /** Per-source quality cap — the curation staple after the per-source
    * report ([[Profile.sourceCurationReport]]) says a source is
    * over-represented: keep only each source's `cap` best documents by
    * [[TextAnalysis.textStatsOf]]'s quality score (doc_id tiebreak, so the
    * cut is deterministic and append-stable for a frozen corpus).
    *
    * Scale: the quality features are a shuffle-free projection (`source`
    * rides through the same scan — no doc_id self-join to re-attach it),
    * and the rank is the salted TWO-phase top-k (the
    * [[Similarity.cosineTopK]] pattern): a local rank within (source, salt)
    * prunes each bucket to `cap` rows, so the global per-source window sees
    * ≤ salts×cap rows — one giant source never funnels its whole corpus
    * through a single window task.
    */
  def sourceCappedCorpus(spark: SparkSession, sfDir: String,
      cap: Int = 10, salts: Int = 8): DataFrame =
    graft.util.Cols.saltedTopK(
      TextAnalysis
        .textStatsOf(Tables.documents(spark, sfDir), carry = Seq("source"))
        .select($"doc_id", $"source", $"quality_score"),
      Seq($"source"), Seq($"quality_score".desc, $"doc_id"), $"doc_id",
      cap, salts)
      .select($"doc_id", $"source", $"quality_score", $"rk")
}
