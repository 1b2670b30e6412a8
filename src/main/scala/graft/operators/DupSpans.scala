package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions
import graft.sources.Tables
import graft.util.Cols._

/** Cross-document duplicated-span detection and removal — the exact-substring
  * dedup of Lee et al. 2022 ("Deduplicating Training Data Makes Language
  * Models Better") re-expressed relationally (builder-brief north star; no
  * reference-repo analogue). Where [[Dedup]]'s MinHash tiers decide whether a
  * whole DOCUMENT is a near-copy, this family finds WHICH token runs are
  * copied: any run of `n` consecutive tokens occurring `minOccurrences`+
  * times corpus-wide marks its positions as duplicated, overlapping marks
  * merge into maximal spans, and the trim entry rebuilds each document with
  * the spans cut out — boilerplate headers, license blocks, and templated
  * paragraphs disappear while the unique prose stays.
  *
  * The published implementation is a single-machine suffix array over the
  * concatenated corpus; that is the part that does NOT survive 100 TB. The
  * relational equivalent: a suffix array's duplicated-substring query is
  * exactly "group fixed-length windows by content, keep groups of 2+", which
  * is a positional-n-gram explode + hash-agg + equi-join — all linear-shuffle
  * operators Spark already parallelizes.
  *
  * Scale design (what must survive 100 TB):
  *  - The explode is O(total corpus tokens) but map-side only, and the gram
  *    text never shuffles: occurrences carry `xxhash64(gram)` (8 bytes), not
  *    the ~8-token string. A hash collision can only ADD a spurious covered
  *    position (two distinct grams colliding both get marked duplicated);
  *    at B distinct grams the expected number of colliding pairs is
  *    ~B²/2^65 — ~3e-9 even at B = 10M — the same accept-and-document
  *    trade [[Dedup.nearDupPairs]] makes for its band signatures.
  *  - The occurrence stream itself NEVER shuffles on the gram: the
  *    duplicated-gram set is tiny relative to the corpus (duplication is the
  *    exception), so the probe is a broadcast hash join — each corpus
  *    partition filters its own positions in place (PlanShapeSpec pins the
  *    build side and the absence of a gram-keyed exchange under the probe).
  *    The count branch shuffles only its map-side partial aggregates
  *    (8-byte key + count). On a degenerate corpus whose duplicated-gram
  *    set outgrows the broadcast threshold, AQE falls back to a sort-merge
  *    join — correctness unchanged, and the shuffle it introduces is the
  *    one that corpus actually requires.
  *  - The corpus is deliberately scanned and exploded twice (once per
  *    branch) rather than materialized: checkpointing O(total tokens)
  *    exploded rows would write the corpus several-fold to disk, while the
  *    second pass re-reads compressed parquet and re-runs a codegen'd
  *    per-row expression — recompute is the cheaper side of that trade at
  *    every scale the explode itself is feasible.
  *  - The island merge (lag/sum windows) runs on COVERED positions only —
  *    the rare output of the probe, not the corpus — partitioned by doc_id.
  *  - The rebuild joins the corpus once, by doc_id, against the per-doc span
  *    lists (only docs that contain duplicated spans appear); span lists are
  *    bounded by tokens/n per doc, so the per-row HOF trim is O(tokens ×
  *    spans-per-doc) with a tiny constant, never a shuffle.
  */
object DupSpans {

  /** Positional token n-gram occurrences: one row per (doc_id, pos, gram)
    * where `gram` is the space-joined run of `n` tokens starting at 0-based
    * token index `pos`. Tokenization is the corpus-wide pinned form
    * ([[TextExpressions.tokenNgramsPos]] — native codegen; the equivalent
    * `transform(sequence(...), i -> array_join(slice(...), ' '))` chain
    * would evaluate interpreted on the hottest O(total tokens) path). */
  def positionalGrams(docs: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    docs.select(
      col("doc_id"),
      posexplode(TextExpressions.tokenNgramsPos(coalesce(col("text"), lit("")), n))
        .as(Seq("pos", "gram")))
  }

  /** Maximal duplicated spans per document: (doc_id, span_start, span_end,
    * n_span_tokens), token indices 0-based inclusive. A position is covered
    * when the n-gram starting there occurs `minOccurrences`+ times
    * corpus-wide (across OR within documents — a doc that repeats its own
    * boilerplate is duplicated text all the same, per Lee et al.); covered
    * windows [p, p+n-1] that overlap or touch merge into one span. */
  def dupSpans(spark: SparkSession, sfDir: String, n: Int = 8,
      minOccurrences: Int = 2): DataFrame =
    dupSpansOf(spread(Tables.documents(spark, sfDir)), n, minOccurrences)

  /** [[dupSpans]] over an explicit (doc_id, text) frame. */
  def dupSpansOf(docs: DataFrame, n: Int = 8,
      minOccurrences: Int = 2): DataFrame = {
    require(minOccurrences >= 2, s"minOccurrences must be >= 2, got $minOccurrences")
    // 8-byte hash key; no explicit repartition — the count branch keeps its
    // map-side partial agg, and the probe branch never shuffles at all while
    // the duplicated-gram set stays broadcastable (AQE's SMJ fallback covers
    // the degenerate corpus where it does not).
    val occ = positionalGrams(docs, n)
      .select(col("doc_id"), col("pos"), xxhash64(col("gram")).as("gh"))
    val dupGrams = occ.groupBy(col("gh"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= minOccurrences)
      .select(col("gh"))
    val covered = occ.join(dupGrams, "gh").select(col("doc_id"), col("pos"))
    mergeCoveredStarts(covered, n)
  }

  /** Gap-and-island merge of covered window STARTS into maximal token
    * spans: starts p1 < p2 overlap/touch iff p2 <= p1 + n. Shared by the
    * corpus-duplication chain ([[dupSpansOf]]) and the benchmark-overlap
    * chain ([[contaminationSpansOf]]) — the covered-position source is the
    * only thing that differs between them. Runs on covered positions only
    * (the rare probe output, never the corpus), partitioned by doc_id. */
  private[operators] def mergeCoveredStarts(covered: DataFrame, n: Int): DataFrame = {
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    covered
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byPos) <= n, lit(0)).otherwise(lit(1)))
      .withColumn("grp", sum(col("brk")).over(byPos))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"))
      .select(
        col("doc_id"),
        col("first_pos").cast("long").as("span_start"),
        (col("last_pos") + lit(n - 1)).cast("long").as("span_end"),
        (col("last_pos") + lit(n) - col("first_pos")).cast("long").as("n_span_tokens"))
  }

  /** The corpus with every duplicated span cut out: (doc_id, n_tokens,
    * n_dropped_tokens, text_trimmed). Every document is rebuilt from its
    * kept tokens joined by single spaces (whitespace-normalized — the same
    * canonical form the tokenizer defines), so span-free documents pass
    * through with runs collapsed, and a document that is ALL duplicated
    * text trims to the empty string rather than being dropped — dropping is
    * [[Dedup]]'s job; this operator's contract is character-level surgery. */
  def spanTrimmedCorpus(spark: SparkSession, sfDir: String, n: Int = 8,
      minOccurrences: Int = 2): DataFrame =
    spanTrimmedCorpusOf(spread(Tables.documents(spark, sfDir)), n, minOccurrences)

  /** [[spanTrimmedCorpus]] over an explicit (doc_id, text) frame. */
  def spanTrimmedCorpusOf(docs: DataFrame, n: Int = 8,
      minOccurrences: Int = 2): DataFrame =
    trimWithSpans(docs, dupSpansOf(docs, n, minOccurrences))

  /** Lee et al.'s MINIMUM-MATCH-LENGTH form: trim only duplicated spans of
    * at least `minSpanTokens` tokens (the paper uses 50), keeping short
    * incidental n-gram matches — quotes, idioms, named entities — in place.
    * Composition of the existing machinery: the n-gram cover + island
    * merge ([[dupSpansOf]]) already yields maximal variable-length spans;
    * this filters to the long ones before the trim. With `minSpanTokens
    * <= n` it degrades to exactly [[spanTrimmedCorpusOf]] (every merged
    * span is at least n tokens by construction — DupSpansSpec pins the
    * equivalence).
    *
    * Approximation note vs the suffix-array original: an island can chain
    * ADJACENT shorter repeats with different partners into one long span,
    * so a span here certifies "every n-window inside repeats somewhere",
    * not "this exact run repeats verbatim" — conservative over-flagging,
    * the same merge semantics [[dupSpansOf]] documents. Scale shape is
    * unchanged: the length filter runs on the span list (the rare output),
    * never the corpus. */
  def longSpanTrimmedCorpusOf(docs: DataFrame, n: Int = 8,
      minOccurrences: Int = 2, minSpanTokens: Int = 50): DataFrame =
    trimWithSpans(docs,
      dupSpansOf(docs, n, minOccurrences)
        .filter(col("n_span_tokens") >= minSpanTokens))

  /** Registered query: [[longSpanTrimmedCorpusOf]] over the `documents`
    * table at the paper's 50-token minimum (the fixture's span lengths
    * straddle 50, so kept-short and trimmed-long branches both exercise).
    * Oracle: the shared span CTEs with the length filter applied to the
    * merged spans, then the same trim tail over the long spans' token
    * indexes. */
  def longSpanTrimmedCorpus(spark: SparkSession, sfDir: String, n: Int = 8,
      minSpanTokens: Int = 50): DataFrame =
    longSpanTrimmedCorpusOf(spread(Tables.documents(spark, sfDir)), n,
      minSpanTokens = minSpanTokens)

  /** Rebuild each document with the given token spans cut out — the trim
    * core shared by [[spanTrimmedCorpusOf]] (duplicated spans) and
    * [[contaminationTrimmedCorpusOf]] (benchmark-overlap spans). `spans` =
    * (doc_id, span_start, span_end) rows, inclusive 0-based token indices. */
  private[operators] def trimWithSpans(docs: DataFrame, spans: DataFrame): DataFrame = {
    val perDoc = spans
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
    docs
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      // coalesce(…, false): a span-free doc left-joins a NULL span list, and
      // a NULL exists() would otherwise drop every token instead of none.
      .withColumn("kept",
        filter(col("toks"), (_, i) =>
          !coalesce(
            exists(col("spans"), s =>
              i.cast("long") >= s.getField("span_start") &&
                i.cast("long") <= s.getField("span_end")),
            lit(false))))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_dropped_tokens"),
        array_join(col("kept"), " ").as("text_trimmed"))
  }

  /** Benchmark-contaminated token spans: WHERE the contamination lives, not
    * just which documents carry it ([[Decontamination]]'s sweep answers
    * that). A corpus position is covered when the n-gram starting there
    * appears anywhere in the benchmark's distinct gram set; covered windows
    * merge gap-and-island into maximal spans — the input to SURGICAL
    * decontamination, which trims the overlapping run and keeps the
    * document's unique prose instead of dropping the whole document.
    *
    * Scale topology is [[Decontamination.contaminationPairsOf]]'s: the
    * benchmark side is small by definition, its distinct grams travel as
    * xxhash64 (8 bytes per gram, ~B²/2^65 spurious-cover probability —
    * the [[dupSpansOf]] trade) and are [[broadcast]]; the corpus's
    * positional grams probe in place and never shuffle on the gram. The
    * island merge runs on covered positions only, keyed by doc_id.
    */
  def contaminationSpansOf(corpus: DataFrame, benchmark: DataFrame,
      n: Int = 8): DataFrame = {
    val occ = positionalGrams(corpus, n)
      .select(col("doc_id"), col("pos"), xxhash64(col("gram")).as("gh"))
    val benchGrams = benchmark
      .select(explode(Decontamination.tokenNgrams(col("text"), n)).as("gram"))
      .select(xxhash64(col("gram")).as("gh")).distinct()
    val covered = occ.join(broadcast(benchGrams), "gh")
      .select(col("doc_id"), col("pos"))
    mergeCoveredStarts(covered, n)
  }

  /** Registered query: contaminated spans of the trainable fixture slice
    * (doc_id % 10 != 0) against the benchmark slice (% 10 == 0) — the same
    * fixture roles as `ngram_contamination`. Oracle: exact-gram DuckDB twin
    * of the hashed probe + island merge. */
  def contaminationSpans(spark: SparkSession, sfDir: String,
      n: Int = 8): DataFrame = {
    val docs = spread(Tables.documents(spark, sfDir))
    contaminationSpansOf(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0), n)
  }

  /** The trainable corpus with benchmark-overlapping spans cut out —
    * surgical decontamination: (doc_id, n_tokens, n_dropped_tokens,
    * text_trimmed), every trainable doc present (span-free docs pass
    * through whitespace-normalized, an all-contaminated doc trims to "").
    * Dropping entirely is a policy choice [[Pipelines]] composes from the
    * sweep; this operator's contract is character-level surgery, exactly
    * like [[spanTrimmedCorpusOf]]. */
  def contaminationTrimmedCorpusOf(corpus: DataFrame, benchmark: DataFrame,
      n: Int = 8): DataFrame =
    trimWithSpans(corpus, contaminationSpansOf(corpus, benchmark, n))

  /** Registered query: [[contaminationTrimmedCorpusOf]] on the fixture
    * slices. Oracle: the span chain's trim tail over the benchmark-covered
    * positions. */
  def contaminationTrimmedCorpus(spark: SparkSession, sfDir: String,
      n: Int = 8): DataFrame = {
    val docs = spread(Tables.documents(spark, sfDir))
    contaminationTrimmedCorpusOf(
      docs.filter(col("doc_id") % 10 =!= 0).select(col("doc_id"), col("text")),
      docs.filter(col("doc_id") % 10 === 0), n)
  }

  /** C4's global span dedup with its documented KEEP-FIRST semantics —
    * "we discard all but one of any three-sentence span occurring more than
    * once in the data set" (Raffel et al. 2020, §2.2). Complementary to
    * [[spanTrimmedCorpusOf]], which is Lee et al.'s trim-EVERY-occurrence:
    * here exactly one canonical copy (the globally first, by (doc_id,
    * block position) — deterministic and append-stable for a frozen
    * prefix) survives per duplicated block.
    *
    * The dedup unit is the non-overlapping `blockSize`-token block — the
    * pseudo-sentence on a corpus without sentence punctuation (C4 splits
    * on sentences; the operator is the same once a sentence splitter
    * defines the block boundaries). Non-overlapping units are what make
    * keep-first well-defined: overlapping grams would let a kept span
    * share tokens with a dropped one.
    *
    * Scale shape (all pieces proven by the siblings here):
    *  - blocking is `sequence`+`explode`+`slice` per row, shuffle-free
    *    ([[TextAnalysis.docChunks]]'s machinery);
    *  - the first-owner table is a hash-agg over blocks whose map-side
    *    partials absorb hot-block skew, FILTERED to duplicated blocks only
    *    — duplication is the exception, so the probe side broadcasts and
    *    the corpus blocks never shuffle (the [[dupSpansOf]] argument; AQE
    *    falls back to the required shuffle on a degenerate corpus);
    *  - the rebuild groups each doc's kept blocks on doc_id — rows that
    *    never left their scan partition, so the exchange carries the
    *    corpus once, by doc, exactly like every other rebuild tier.
    */
  def blockDedupOf(docs: DataFrame, blockSize: Int = 8): DataFrame = {
    require(blockSize >= 1, s"blockSize must be >= 1, got $blockSize")
    val base = spread(docs)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
    val lastBlock =
      floor((size(col("toks")) - 1).cast("double") / blockSize).cast("int")
    val blocks = base
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), lastBlock)).as("block_id"))
      .select(col("doc_id"), col("block_id").cast("long").as("block_id"),
        array_join(slice(col("toks"), col("block_id") * blockSize + 1,
          lit(blockSize)), " ").as("block"))
    val dupFirsts = blocks
      .groupBy(col("block"))
      .agg(min(struct(col("doc_id"), col("block_id"))).as("first"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
      .select(col("block"), col("first"))
    val kept = blocks
      .join(broadcast(dupFirsts), Seq("block"), "left")
      .filter(col("first").isNull ||
        struct(col("doc_id"), col("block_id")) === col("first"))
    val totals = base.select(col("doc_id"),
      (lastBlock + 1).cast("long").as("n_blocks"))
    val keptAgg = kept
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks_kept"),
        array_join(transform(
          sort_array(collect_list(struct(col("block_id"), col("block")))),
          s => s.getField("block")), " ").as("deduped_text"))
    totals.join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_blocks"),
        coalesce(col("n_blocks_kept"), lit(0L)).as("n_blocks_kept"),
        coalesce(col("deduped_text"), lit("")).as("deduped_text"))
  }

  /** Registered query: [[blockDedupOf]] over the `documents` table,
    * 8-token blocks. Full DuckDB twin: same blocking, a window
    * (first-occurrence rank + occurrence count) instead of the min-struct
    * agg, ordered string_agg rebuild. */
  def blockDedupCorpus(spark: SparkSession, sfDir: String): DataFrame =
    blockDedupOf(Tables.documents(spark, sfDir))
}
