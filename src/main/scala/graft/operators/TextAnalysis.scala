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
  def textStats(spark: SparkSession, sfDir: String): DataFrame = {
    // materialize tokens/counts ONCE in a first projection: referencing the
    // tokenizer expression from several output columns would re-run the
    // (interpreted) HOF per column — CollapseProject keeps multi-referenced
    // non-trivial expressions un-inlined, so the two-step shape sticks
    val toks = tokens($"text")
    val base = spread(Tables.documents(spark, sfDir)).select(
      $"doc_id",
      length(coalesce($"text", lit(""))).as("len_i"),
      size(toks).as("n_tok_i"),
      size(filter(toks, w => w.isin(stopwords: _*))).as("n_stop_i"),
      bpeTokenCount($"text").as("n_bpe_i"),
      (length(coalesce($"text", lit(""))) -
        length(regexp_replace(coalesce($"text", lit("")), "[\\p{Punct}]", ""))).as("n_punct_i"))
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
    base.select(
      $"doc_id",
      $"len_i".cast("long").as("len_chars"), // DuckDB len() is BIGINT
      $"n_tok_i".cast("long").as("n_tokens"),
      $"n_bpe_i".cast("long").as("n_bpe_tokens"),
      $"n_stop_i".cast("long").as("n_stopwords"),
      round(punctRatio, 4).as("punct_ratio"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(scoreNum.cast("double") / scoreDen + eps, 4).as("quality_score"))
  }

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "est"),
    "es" -> Seq("el", "los", "las", "de", "y", "un", "es"))

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
    val hits = markers.map { case (lang, ws) =>
      lang -> size(filter($"toks", w => w.isin(ws: _*)))
    }
    val Seq(en, fr, es) = hits.map(_._2)
    withToks
      .select($"doc_id", en.cast("long").as("n_en"),
        fr.cast("long").as("n_fr"), es.cast("long").as("n_es"))
      .select($"doc_id", $"n_en", $"n_fr", $"n_es",
        when($"n_en" >= $"n_fr" && $"n_en" >= $"n_es", "en")
          .when($"n_fr" >= $"n_es", "fr").otherwise("es").as("lang_guess"))
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

  /** Roll-up: per-language volume and quality profile (one hash-agg). */
  def langProfile(spark: SparkSession, sfDir: String): DataFrame =
    spread(Tables.documents(spark, sfDir))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(length(coalesce($"text", lit("")))), 2).as("avg_len"),
        round(avg(size(tokens($"text"))), 2).as("avg_tokens"))

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
