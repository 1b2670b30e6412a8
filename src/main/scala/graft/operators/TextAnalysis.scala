package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols._

/** Text-analysis operators for LLM-training-data pipelines (builder-brief
  * north star): per-document statistics, quality scoring, tokenization
  * counts, n-gram language identification, and content fingerprinting.
  *
  * Everything is built-in column expressions (regexp/array/higher-order
  * functions) — codegen'd, shuffle-free, embarrassingly parallel per row:
  * the exact shape that scales linearly to 100 TB. The only shuffles in this
  * file are the final small roll-ups (one hash-agg each).
  */
object TextAnalysis {

  /** Whitespace tokens, empty-safe (split of "" would yield [""]). The
    * separator class is the explicit RE2-compatible `[ \t\n\r\f]` shared
    * with the DuckDB twins' `string_split_regex` — Java's `\s` would also
    * split on vertical tab (\u000B), which RE2 treats as a token character
    * (same convergence rule as `Decontamination.tokenNgrams`). */
  def tokens(text: Column): Column = {
    val t = trim(coalesce(text, lit("")))
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "[ \\t\\n\\r\\f]+"))
  }

  /** BPE-ish token count: letter runs, digit runs, and single non-space
    * symbols — the pre-merge word pieces a byte-pair tokenizer starts from.
    * The negated class spells out RE2's `\s` for the same cross-engine
    * convergence as [[tokens]] (under Java's `\s`, \u000B would be excluded
    * from the symbol class that the DuckDB twin includes it in).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(coalesce(text, lit("")),
      lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r\\f]"), lit(0)))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Per-document statistics + a deterministic quality score.
    *
    * The score is rational arithmetic only (no transcendentals), so the
    * DuckDB oracle reproduces it bit-for-bit after 4-dp rounding:
    * 0.5·min(len/500,1) + 0.3·stopword_ratio + 0.2·(1−punct_ratio).
    */
  def textStats(spark: SparkSession, sfDir: String): DataFrame =
    textStatsOf(Tables.documents(spark, sfDir))

  /** [[textStats]] over any (doc_id, text) frame — the form a streaming
    * micro-batch or a mid-pipeline frame feeds (same plan, same oracle
    * semantics; the table entry above is this applied to `documents`). */
  def textStatsOf(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    // materialize tokens/counts ONCE in a first projection: referencing the
    // tokenizer expression from several output columns would re-run the
    // (interpreted) HOF per column — CollapseProject keeps multi-referenced
    // non-trivial expressions un-inlined, so the two-step shape sticks
    // (`carry` columns ride through both projections so downstream curation
    // ops — e.g. the per-source cap — never pay a doc_id self-join to
    // re-attach metadata the scan already had in hand)
    val toks = tokens($"text")
    val base = spread(docs).select(Seq(
      $"doc_id",
      length(coalesce($"text", lit(""))).as("len_i"),
      size(toks).as("n_tok_i"),
      size(filter(toks, w => w.isin(stopwords: _*))).as("n_stop_i"),
      bpeTokenCount($"text").as("n_bpe_i"),
      (length(coalesce($"text", lit(""))) -
        length(regexp_replace(coalesce($"text", lit("")), "[\\p{Punct}]", ""))).as("n_punct_i"))
      ++ carry.map(col): _*)
    // Cross-engine rounding determinism (bit at sf0.1): every rounded ratio
    // is (a) computed as ONE division of exact integers, so the pre-rounding
    // double is bit-identical in any engine, and (b) nudged +1e-9 before
    // rounding — Spark rounds the double's shortest decimal rendering
    // (BigDecimal.valueOf) while DuckDB scales-then-rounds in binary, and
    // they disagree on exact half-way decimals like 7/160 = 0.04375; the
    // nudge lands every boundary consistently on round-up in both.
    val eps = lit(1e-9)
    val punctRatio = $"n_punct_i".cast("double") / greatest($"len_i", lit(1)) + eps
    val stopRatio = $"n_stop_i".cast("double") / greatest($"n_tok_i", lit(1)) + eps
    val gLen = greatest($"len_i", lit(1)).cast("long")
    val gTok = greatest($"n_tok_i", lit(1)).cast("long")
    val scoreNum = least($"len_i", lit(500)).cast("long") * gTok * gLen +
      lit(300L) * $"n_stop_i" * gLen +
      lit(200L) * (gLen - $"n_punct_i") * gTok
    val scoreDen = lit(1000L) * gTok * gLen
    base.select(Seq(
      $"doc_id",
      $"len_i".cast("long").as("len_chars"), // DuckDB len() is BIGINT
      $"n_tok_i".cast("long").as("n_tokens"),
      $"n_bpe_i".cast("long").as("n_bpe_tokens"),
      $"n_stop_i".cast("long").as("n_stopwords"),
      round(punctRatio, 4).as("punct_ratio"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(scoreNum.cast("double") / scoreDen + eps, 4).as("quality_score"))
      ++ carry.map(col): _*)
  }

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "est"),
    "es" -> Seq("el", "los", "las", "de", "y", "un", "es"))

  /** Marker-hit count per language over a tokenized column, in the fixed
    * `markers` order. Shared by [[langId]] and [[langConfusion]] so the
    * counting can't drift between the gate and its eval table. */
  private def markerHits(toks: Column): Seq[(String, Column)] =
    markers.map { case (lang, ws) =>
      lang -> size(filter(toks, w => w.isin(ws: _*)))
    }

  /** The langId argmax over [[markerHits]] — ties resolve in the fixed
    * en→fr→es order. ONE definition: langId (the clean/release chains gate
    * on it) and langConfusion (the eval of that gate) must agree by
    * construction, not by a test pinning two inline copies together. */
  private def langGuessExpr(toks: Column): Column = {
    val Seq(en, fr, es) = markerHits(toks).map(_._2)
    when(en >= fr && en >= es, "en").when(fr >= es, "fr").otherwise("es")
  }

  /** N-gram(1) language-ID heuristic: count marker-word hits per language,
    * pick the argmax (ties resolve in the fixed en→fr→es order). A real
    * pipeline extends `markers` — the operator shape (per-row array filter +
    * chained comparison, zero shuffles) is what matters at scale.
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    // tokenize once into a materialized column (see textStats note), then
    // count each language's markers from it
    val withToks = spread(Tables.documents(spark, sfDir))
      .select($"doc_id", tokens($"text").as("toks"))
    val hits = markerHits($"toks")
    val Seq(en, fr, es) = hits.map(_._2)
    withToks
      .select($"doc_id", en.cast("long").as("n_en"),
        fr.cast("long").as("n_fr"), es.cast("long").as("n_es"),
        langGuessExpr($"toks").as("lang_guess"))
  }

  /** Per-document repetition-quality signals — the Gopher/C4 pre-training
    * filters: duplicate-line fraction, fraction of characters inside
    * repeated line occurrences, and the most-frequent word-bigram's share
    * of all bigrams. A high value on any of them marks boilerplate-heavy or
    * machine-generated text that quality-gated corpus builds drop.
    *
    * One fused codegen expression per row
    * ([[graft.functions.RepetitionStatsExpr]]), no shuffle — the column
    * form would explode lines AND bigrams and run two shuffled group-bys
    * per signal, turning a per-row property into corpus-sized exchanges.
    * Every emitted fraction is one division of exact integers (+1e-9 nudge
    * before the 4-dp round, see textStats) so the DuckDB twin matches
    * bit-for-bit.
    */
  def repetitionStats(spark: SparkSession, sfDir: String,
      n: Int = 2): DataFrame = {
    // two-step select: the stats array is referenced three times, and
    // CollapseProject keeps multi-referenced non-trivial expressions
    // un-inlined (see textStats note)
    val base = spread(Tables.documents(spark, sfDir)).select(
      $"doc_id",
      graft.functions.TextExpressions
        .repetitionStats(coalesce($"text", lit("")), n).as("rs"))
    base.select(
      $"doc_id",
      round(element_at($"rs", 1) + 1e-9, 4).as("dup_line_frac"),
      round(element_at($"rs", 2) + 1e-9, 4).as("dup_line_char_frac"),
      round(element_at($"rs", 3) + 1e-9, 4).as("top_bigram_frac"))
  }

  /** Winnowing-style document fingerprint: minimum MD5 over the document's
    * character shingles — one stable 128-bit id per content neighborhood,
    * computable without any shuffle. MD5 (not xxhash64) so the DuckDB
    * oracle can reproduce it exactly. Native fused expression
    * ([[graft.functions.MinMd5ShinglesExpr]]): the `transform(..., md5)`
    * column form would run interpreted per shingle.
    */
  def fingerprint(spark: SparkSession, sfDir: String,
      shingleLen: Int = 8): DataFrame =
    spread(Tables.documents(spark, sfDir)).select(
      $"doc_id",
      graft.functions.TextExpressions.minMd5Shingles(
        coalesce($"text", lit("")), shingleLen).as("fingerprint"))

  /** Corpus vocabulary statistics: the `topK` most frequent whitespace
    * tokens with occurrence and document frequency — the first artifact of
    * tokenizer training and stop-word derivation over a new corpus.
    *
    * Scale shape: classic word-count. The explode is map-side; the
    * occurrence count partial-aggregates before the single shuffle on
    * `token`; the distinct doc count is planned as a two-level aggregate
    * whose first level keys (token, doc_id) — it compresses by the
    * per-document token multiplicity before anything moves. The top-K is a
    * `TakeOrderedAndProject` (per-partition heaps + driver merge of K rows),
    * never a global sort.
    */
  def vocabStats(spark: SparkSession, sfDir: String, topK: Int = 100): DataFrame =
    spread(Tables.documents(spark, sfDir))
      .select($"doc_id", explode(tokens($"text")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct($"doc_id").as("doc_freq"))
      .orderBy($"n_occurrences".desc, $"token")
      .limit(topK)

  /** Token 8-grams appearing in more than one document, with their document
    * frequency — the exact-substring duplication signal (the span-level
    * complement of document-level near-dup): any gram here is a candidate
    * boilerplate/template run shared across the corpus.
    *
    * Grams come from the native codegen [[graft.functions.TokenNgramsExpr]]
    * (already distinct per doc, so `count(*)` IS the doc frequency — no
    * distinct aggregate needed). One shuffle, partial-aggregated map-side;
    * the `df >= minDocs` filter runs inside the final aggregate so only
    * genuinely shared grams survive. At 100 TB the audit-friendly string
    * gram key would be swapped for `xxhash64(gram)` (8 bytes through the
    * shuffle); strings are kept here so every hit is directly readable and
    * the DuckDB twin can replay it.
    */
  def ngramDocFreq(spark: SparkSession, sfDir: String,
      n: Int = 8, minDocs: Int = 2): DataFrame =
    spread(Tables.documents(spark, sfDir))
      .select(explode(Decontamination.tokenNgrams($"text", n)).as("gram"))
      .groupBy($"gram")
      .agg(count(lit(1)).as("doc_freq"))
      .filter($"doc_freq" >= minDocs)

  /** The first step of byte-pair-encoding tokenizer training: count
    * adjacent character pairs across all word occurrences — the pair with
    * the highest count is BPE's first merge. Pairs keep their WITHIN-word
    * multiplicity ("aaaa" contributes "aa" three times), and words count
    * once per occurrence, which is exactly the frequency-weighted pair
    * statistic the merge loop consumes. Emitted: the top `topK` candidate
    * merges by (count desc, pair).
    *
    * The full BPE training loop re-counts after each merge — that loop is
    * driver-iterative by nature; what a 100 TB corpus needs from the
    * cluster is THIS query (and its re-runs on re-segmented words), each
    * one wordcount-shaped: explode is map-side, the count partial-
    * aggregates before the single shuffle on `pair`, top-K is a
    * TakeOrderedAndProject.
    */
  def bpePairCounts(spark: SparkSession, sfDir: String,
      topK: Int = 50): DataFrame = {
    spread(Tables.documents(spark, sfDir))
      .select(explode(tokens($"text")).as("word"))
      .filter(length($"word") >= 2)
      .select(explode(transform(
        sequence(lit(1), length($"word") - 1),
        i => $"word".substr(i, lit(2)))).as("pair"))
      .groupBy($"pair")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"pair")
      .limit(topK)
  }

  /** The bounded-memory scale path of [[vocabStats]]: a SpaceSaving
    * heavy-hitter sketch ([[graft.functions.Aggregators.SpaceSavingTopK]])
    * instead of the exact wordcount. Each task tracks at most `capacity`
    * counters over its partition; the shuffle carries O(tasks × capacity)
    * — never O(distinct tokens), which is what makes top-K over a 100 TB
    * vocabulary (URLs, n-grams, user ids...) tractable when the exact
    * form's (token, doc_id)-grained shuffle would dominate the job.
    *
    * Exactness regime: whenever every task sees ≤ `capacity` distinct
    * items the sketch IS the exact count (err 0) — the fixture's regime
    * (31 distinct tokens ≪ 256), which is why the registered entry shares
    * [[vocabStats]]'s exact oracle semantics (minus doc_freq, which a
    * frequency sketch does not track). The eviction regime's error bounds
    * are pinned by spec instead.
    */
  def vocabStatsSketch(spark: SparkSession, sfDir: String,
      topK: Int = 100, capacity: Int = 256): DataFrame = {
    val sketch = udaf(new graft.functions.Aggregators.SpaceSavingTopK(capacity))
    spread(Tables.documents(spark, sfDir))
      .select(explode(tokens($"text")).as("token"))
      .agg(sketch($"token").as("counters"))
      .select(explode($"counters").as("c"))
      .select($"c.item".as("token"), $"c.count".as("n_occurrences"))
      .orderBy($"n_occurrences".desc, $"token")
      .limit(topK)
  }

  /** Per-document top-`k` characteristic terms by tf·idf with a LINEAR
    * inverse-document-frequency (score = tf / df): rational arithmetic
    * keeps the oracle comparison exact — a logarithmic idf is a one-line
    * swap (`log(N / df)`) that changes only this scoring expression, not
    * the plan. Rounded at 6 dp with the standard +1e-9 half-way nudge
    * (1/128 = 0.0078125 is a genuine 7-digit boundary).
    *
    * Scale shape: tf is one shuffle on (doc_id, token), partial-aggregated
    * map-side, then `localCheckpoint`ed — it feeds BOTH the join side and
    * the df derivation, and without the cut Catalyst's column pruning
    * de-canonicalizes the shared subtree so ReuseExchange misses and the
    * corpus is exploded + shuffled TWICE (observed: 5 exchanges → 2 after
    * the cut; same materialize-the-fan-out call as `Dedup.dupClusters`).
    * df derives from tf (vocabulary-sized — millions of rows, not
    * corpus-sized) and is [[broadcast]] back onto it, so the corpus-scale
    * side never moves for the join. The per-document rank windows on
    * doc_id — billions of small partitions, no funnel key — with Spark's
    * WindowGroupLimit computing the top-k partially before the shuffle.
    */
  def tfidfTopTerms(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = spread(Tables.documents(spark, sfDir))
      .select($"doc_id", explode(tokens($"text")).as("token"))
      .groupBy($"doc_id", $"token")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df_ = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df_), "token")
      .select($"doc_id", $"token",
        round($"tf".cast("double") / $"df" + 1e-9, 6).as("score"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"token")
    scored.select($"doc_id", $"token", $"score",
        row_number().over(w).cast("long").as("rk"))
      .filter($"rk" <= k)
  }

  /** Fixed-size token chunking: each document split into consecutive
    * `chunkSize`-token training chunks (last chunk ragged), emitted as
    * (doc_id, chunk_id, n_chunk_tokens, chunk_md5) — the
    * sequence-preparation step between corpus hygiene and tokenizer/packer.
    * The md5 is over the space-rejoined chunk text: a stable content id a
    * downstream packer can dedup or shuffle on without carrying the text.
    *
    * Shuffle-free: `sequence` + `explode` + `slice` are all per-row; output
    * rows stay on the partition that read the document. Empty documents
    * yield no chunks.
    */
  def docChunks(spark: SparkSession, sfDir: String,
      chunkSize: Int = 64): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    val base = spread(Tables.documents(spark, sfDir))
      .select($"doc_id", tokens($"text").as("toks"))
      .filter(size($"toks") > 0)
    val lastChunk = floor((size($"toks") - 1).cast("double") / chunkSize).cast("int")
    base
      .select($"doc_id", $"toks",
        explode(sequence(lit(0), lastChunk)).as("chunk_id"))
      .select($"doc_id", $"chunk_id".cast("long").as("chunk_id"),
        slice($"toks", $"chunk_id" * chunkSize + 1, lit(chunkSize)).as("chunk"))
      .select($"doc_id", $"chunk_id",
        size($"chunk").cast("long").as("n_chunk_tokens"),
        md5(array_join($"chunk", " ")).as("chunk_md5"))
  }

  /** Lexical-rarity quality signal: each document's mean corpus frequency
    * of its tokens — documents built from rare tokens score low, stopword
    * soup scores high; real pipelines gate on exactly this family of
    * lexical statistics (the integer-exact cousin of an LM-perplexity
    * filter). Score = (Σ_t count(t)) / (n_tokens · N_total): every sum is
    * over BIGINTs (engine-order-independent), ONE double division at the
    * end (+1e-9 nudge, 6-dp round) — so the DuckDB twin matches
    * bit-for-bit where a log-prob formulation could not (transcendentals
    * and double-sum order both diverge between engines).
    *
    * Scale: vocabulary counts are one wordcount (vocab-sized result,
    * [[broadcast]] back); the per-doc sum is one shuffle on doc_id of
    * (token, count)-joined rows that never leave their scan partition
    * before the partial agg. The corpus is tokenized twice (once per
    * branch): the checkpoint cut is placed on the VOCAB-sized aggregate,
    * never on the O(total tokens) explode — materializing the small side
    * and re-running the cheap map-only pass is the right trade at 100 TB
    * (the opposite of [[tfidfTopTerms]], whose shared subtree carries a
    * shuffle). N_total folds out of the checkpointed vocab (vocab-sized
    * sum), not a third corpus pass.
    */
  def tokenRarityScore(spark: SparkSession, sfDir: String): DataFrame = {
    def ex = spread(Tables.documents(spark, sfDir))
      .select($"doc_id", explode(tokens($"text")).as("token"))
    val vocab = ex.groupBy($"token").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val total = lit(vocab.agg(sum($"cnt")).head.getLong(0))
    ex.join(broadcast(vocab), "token")
      .groupBy($"doc_id")
      .agg(sum($"cnt").as("sum_cnt"), count(lit(1)).as("n_tokens"))
      .select($"doc_id", $"n_tokens",
        // low = rare-token-heavy (flag for review), high = stopword soup
        round($"sum_cnt".cast("double") /
          ($"n_tokens" * total).cast("double") + 1e-9, 6).as("mean_token_freq"))
  }

  /** Sequence PACKING — the step between chunking and the trainer: chunks
    * are laid end-to-end in a deterministic order and cut into
    * `contextLen`-token packs, so short ragged tails from many documents
    * share a context window instead of each wasting one (the standard
    * concat-and-pack scheme). Assignment is by running token total:
    * pack_id = floor(tokens-before-this-chunk / contextLen) — integer
    * arithmetic end-to-end, so the DuckDB twin replays it exactly.
    * Output: one row per pack with chunk/token counts and the fill ratio
    * against the pack's capacity.
    *
    * Scale: a GLOBAL running sum would be one window partition — a funnel.
    * Packing is therefore per-SHARD ([[Sampling.shardOf]], the same 16-way
    * layout [[Sampling.corpusShards]] audits): each shard packs its own
    * chunks independently (shard_id, pack_id) — embarrassingly parallel
    * across shards, which is how a 100 TB corpus packs on 1000 executors
    * (with tens of thousands of shards, not 16). Within a shard the order
    * (doc_id, chunk_id) is total, so the cumsum is deterministic.
    */
  def packedSequences(spark: SparkSession, sfDir: String,
      contextLen: Int = 256, nShards: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(contextLen >= 1)
    val chunks = docChunks(spark, sfDir)
      .withColumn("shard", Sampling.shardOf($"doc_id", nShards))
    val w = Window.partitionBy($"shard").orderBy($"doc_id", $"chunk_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = chunks.select($"shard", $"doc_id", $"chunk_id", $"n_chunk_tokens",
        (sum($"n_chunk_tokens").over(w) - $"n_chunk_tokens").as("cum_before"))
      // `div`: exact integer division on both engines (a double `/` could
      // land a half-ulp above an integer boundary and truncate differently)
      .withColumn("pack_id", expr(s"cum_before div $contextLen"))
    packed.groupBy($"shard", $"pack_id")
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct($"doc_id").as("n_docs"),
        sum($"n_chunk_tokens").as("n_tokens"))
      .orderBy($"shard", $"pack_id")
  }

  /** LENGTH-BUCKETED batching — the padded-batch counterpart of
    * [[packedSequences]]: when examples are NOT concat-packed (SFT,
    * contrastive pairs, rerankers), every batch pads to its LONGEST
    * member, so grouping similar lengths is the standard padding-waste
    * control. Bucket = the token count's bit length (`length(bin(n))` —
    * the integer-exact floor(log2)+1 both engines compute identically; a
    * float log2 could straddle exact powers of two); within each
    * (shard, bucket) the (doc_id) order is total and
    * batch = `(row_number−1) DIV batchSize`.
    *
    * Output: one row per (shard, bucket, batch) with the doc count, the
    * padded width (max tokens), the real token mass, and the fill ratio
    * in exact integer micros (`sum·1e6 DIV (n·max)`) — the padding-waste
    * audit a trainer reads. Empty docs carry no trainable tokens and are
    * excluded by contract.
    *
    * Scale: same shard-parallel layout as [[packedSequences]] — the only
    * window partitions by (shard, bucket), so batching parallelizes
    * across shards × buckets and nothing global-sorts. */
  def lengthBucketedBatches(spark: SparkSession, sfDir: String,
      batchSize: Int = 8, nShards: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(batchSize >= 1)
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id",
        size(tokens($"text")).cast("long").as("n_tokens"))
      .filter($"n_tokens" >= 1)
      .withColumn("shard", Sampling.shardOf($"doc_id", nShards))
      .withColumn("bucket", length(bin($"n_tokens")).cast("int"))
    val w = Window.partitionBy($"shard", $"bucket").orderBy($"doc_id")
    docs
      .withColumn("rn", row_number().over(w))
      .withColumn("batch_idx", expr(s"cast(rn - 1 as bigint) div $batchSize"))
      .groupBy($"shard", $"bucket", $"batch_idx")
      .agg(count(lit(1)).as("n_docs"),
        max($"n_tokens").as("max_tokens"),
        sum($"n_tokens").as("sum_tokens"))
      .select($"shard", $"bucket", $"batch_idx", $"n_docs", $"max_tokens",
        $"sum_tokens",
        expr("sum_tokens * 1000000 DIV (n_docs * max_tokens)")
          .as("fill_micros"))
  }

  /** Padding-waste REPORT — the one-table summary behind
    * [[lengthBucketedBatches]]: both batching strategies (length-bucketed
    * vs plain doc_id-sequential) rolled up to corpus totals — batch count,
    * real token mass, PADDED token mass (Σ per-batch n·max — what the
    * accelerator actually processes), and the overall fill ratio in exact
    * integer micros. The delta between the two rows is the compute the
    * bucketing saves; the real token mass must be identical (both
    * strategies batch every non-empty doc exactly once).
    *
    * Scale: the bucketed row reuses [[lengthBucketedBatches]]'s rollup
    * (shard × bucket parallel windows); the sequential row shards the same
    * way WITHOUT the bucket key — same window cost, one row each. */
  def paddingWasteReport(spark: SparkSession, sfDir: String,
      batchSize: Int = 8, nShards: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = lengthBucketedBatches(spark, sfDir, batchSize, nShards)
      .select(lit("bucketed").as("strategy"), $"n_docs", $"max_tokens",
        $"sum_tokens")
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", size(tokens($"text")).cast("long").as("n_tokens"))
      .filter($"n_tokens" >= 1)
      .withColumn("shard", Sampling.shardOf($"doc_id", nShards))
    val w = Window.partitionBy($"shard").orderBy($"doc_id")
    val sequential = docs
      .withColumn("rn", row_number().over(w))
      .withColumn("batch_idx", expr(s"cast(rn - 1 as bigint) div $batchSize"))
      .groupBy($"shard", $"batch_idx")
      .agg(count(lit(1)).as("n_docs"), max($"n_tokens").as("max_tokens"),
        sum($"n_tokens").as("sum_tokens"))
      .select(lit("sequential").as("strategy"), $"n_docs", $"max_tokens",
        $"sum_tokens")
    bucketed.unionByName(sequential)
      .groupBy($"strategy")
      .agg(count(lit(1)).as("n_batches"),
        sum($"sum_tokens").as("real_tokens"),
        sum($"n_docs" * $"max_tokens").as("padded_tokens"))
      .select($"strategy", $"n_batches", $"real_tokens", $"padded_tokens",
        expr("real_tokens * 1000000 DIV padded_tokens").as("fill_micros"))
  }

  /** Per-source quality CALIBRATION: z-score each document's quality
    * against its own source's distribution, so a 0.6 from a terse source
    * and a 0.6 from a verbose one become comparable before a global
    * quality gate — the cross-source correction a mixed-corpus curation
    * pass needs (a fixed global threshold systematically starves sources
    * whose style scores low).
    *
    * Exactness: quality_score is a 4-decimal double, so ×10⁴ is an exact
    * integer; sums and squared sums accumulate in decimal(38,0) (engine-
    * order-proof — the [[Profile]] outlier pattern), and the only float
    * step is the final z division: z = (n·q − S) / √(n·Q − S²), one cast
    * and one sqrt of EXACT integers, rounded to 6 decimals. decimal(38)
    * headroom: q ≤ 10⁴ so n·Q ≤ n²·10⁸ — safe past 10¹⁴ docs/source.
    *
    * Scale: one hash-agg for the source-count-sized moment table,
    * broadcast back; the corpus never shuffles.
    */
  def qualityCalibration(spark: SparkSession, sfDir: String): DataFrame = {
    val stats = textStatsOf(Tables.documents(spark, sfDir), carry = Seq("source"))
      .select($"doc_id", $"source", $"quality_score",
        round($"quality_score" * 10000).cast("long").as("qm"))
    val mom = stats.groupBy($"source").agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum($"qm".cast("decimal(38,0)")).as("s"),
      sum(($"qm" * $"qm").cast("decimal(38,0)")).as("q2"))
    stats.join(broadcast(mom), "source")
      .select($"doc_id", $"source", $"quality_score",
        round(($"n" * $"qm" - $"s").cast("double") /
          sqrt(($"n" * $"q2" - $"s" * $"s").cast("double")), 6).as("z"))
  }

  /** Per-source n-gram DIVERSITY (distinct / total trigrams — the
    * type-token ratio at gram granularity): the template-detection signal
    * curation pipelines use — boilerplate-heavy or machine-generated
    * sources score low because their gram vocabulary saturates while
    * volume keeps growing.
    *
    * Scale: total grams per source needs NO explode — it is
    * Σ max(n_tokens−(n−1), 0), one narrow hash-agg; the distinct side
    * explodes each doc's DISTINCT grams once (the codegen
    * [[graft.functions.TextExpressions]] shingler) into a count-distinct
    * keyed (source, gram) — the same linear shape as the vocab family.
    */
  def sourceNgramDiversity(spark: SparkSession, sfDir: String,
      n: Int = 3): DataFrame = {
    val docs = spread(Tables.documents(spark, sfDir))
    val totals = docs
      .select($"source",
        greatest(size(tokens($"text")) - (n - 1), lit(0)).cast("long").as("tg"))
      .groupBy($"source").agg(sum($"tg").as("total_grams"))
    val distincts = docs
      .select($"source", explode(Decontamination.tokenNgrams($"text", n)).as("gram"))
      .groupBy($"source").agg(countDistinct($"gram").as("distinct_grams"))
    totals.join(distincts, "source")
      .select($"source", $"total_grams", $"distinct_grams",
        round($"distinct_grams".cast("double") /
          greatest($"total_grams", lit(1L)).cast("double"), 6).as("diversity"))
      .orderBy($"source")
  }

  /** Registered query: the packing-efficiency audit over
    * [[packedSequences]] — per shard: pack count, token volume, mean fill
    * against the `contextLen` budget, and how many packs OVERFLOW it (the
    * cumulative-offset packing assigns a chunk to the pack its first token
    * lands in, so a boundary-straddling chunk overfills its pack — the
    * number a trainer needs to size its truncation/continuation policy).
    * A release pipeline reads this table before shipping shards: fill far
    * below 1.0 means wasted context windows; heavy overflow means the
    * chunker's maxTokens is mis-sized against the trainer's context.
    *
    * Scale: a shard-count-sized rollup of the already-linear packing
    * derivation — nothing new shuffles.
    */
  def packingEfficiency(spark: SparkSession, sfDir: String,
      contextLen: Int = 256, nShards: Int = 16): DataFrame =
    packedSequences(spark, sfDir, contextLen, nShards)
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_packs"),
        sum($"n_tokens").as("n_tokens"),
        round(sum($"n_tokens").cast("double") /
          (count(lit(1)) * lit(contextLen)).cast("double"), 6).as("mean_fill"),
        sum(when($"n_tokens" > contextLen, 1L).otherwise(0L)).as("n_overflow"))
      .orderBy($"shard")

  /** Roll-up: per-language volume and quality profile (one hash-agg). */
  def langProfile(spark: SparkSession, sfDir: String): DataFrame =
    spread(Tables.documents(spark, sfDir))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(length(coalesce($"text", lit("")))), 2).as("avg_len"),
        round(avg(size(tokens($"text"))), 2).as("avg_tokens"))

  /** Language-ID confusion matrix — the [[langId]] heuristic's prediction
    * against the labeled `lang` column, one row per (labeled, predicted)
    * cell with the within-label share (the per-language recall
    * decomposition). This is the eval table that decides whether the cheap
    * marker heuristic is fit to GATE on (the clean/release chains filter
    * lang_guess = 'en') or needs a model upgrade. ONE corpus scan — the
    * guess is computed inline with the label in hand, never a doc_id
    * self-join back to the corpus — then a languages²-sized rollup; the
    * share is one division of exact counts, r6, over a window whose
    * partitions are label-sized (≤ languages rows each).
    */
  def langConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    spread(Tables.documents(spark, sfDir))
      .select($"lang", tokens($"text").as("toks"))
      .select($"lang", langGuessExpr($"toks").as("lang_guess"))
      .groupBy($"lang", $"lang_guess")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("row_share", round($"n_docs".cast("double") /
        sum($"n_docs").over(Window.partitionBy($"lang")), 6))
      .orderBy($"lang", $"lang_guess")
  }

  /** Tokenizer fertility per language — BPE-ish tokens emitted per
    * whitespace word, the standard multilingual tokenizer-budget
    * diagnostic: a language with high fertility is under-served by the
    * vocabulary (each word fragments into many pieces), pays more sequence
    * length for the same content, and effectively trains on less text per
    * token budget. Exact integer sums (map-side combinable), ONE final
    * division, r6 — a language with zero words reports NULL fertility in
    * both engines.
    */
  def tokenizerFertility(spark: SparkSession, sfDir: String): DataFrame =
    spread(Tables.documents(spark, sfDir))
      .select($"lang", size(tokens($"text")).as("n_tok"),
        bpeTokenCount($"text").as("n_bpe"))
      .groupBy($"lang")
      .agg(sum($"n_tok").as("n_words"), sum($"n_bpe").as("n_bpe_tokens"))
      .withColumn("fertility",
        round($"n_bpe_tokens".cast("double") / $"n_words", 6))
      .orderBy($"lang")

  /** Hierarchical ROLLUP over (lang, source): per-pair, per-lang subtotal,
    * and grand-total rows in ONE pass — Catalyst's Expand emits the three
    * grouping sets map-side, so the corpus is still scanned once and one
    * shuffle carries (groups × 3) rows. `grouping_id` disambiguates subtotal
    * rows from genuine NULL group values (both engines emit the same ids).
    */
  def langSourceRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .rollup($"lang", $"source")
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_docs"),
        round(avg($"n_chars") + 1e-9, 2).as("avg_chars"))
      .select($"lang", $"source", $"gid", $"n_docs", $"avg_chars")
      .orderBy($"gid", $"lang", $"source")
}
