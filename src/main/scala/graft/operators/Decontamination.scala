package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols._

/** Benchmark decontamination: find training-corpus documents that share
  * token n-grams with an evaluation/benchmark set (builder-brief north star;
  * no reference-repo analogue). This is the standard pre-training hygiene
  * sweep — published pipelines flag a training doc as contaminated when it
  * shares one or more runs of ~8-13 consecutive tokens with any benchmark
  * item, then drop or audit it.
  *
  * Scale design (what must survive 100 TB):
  *  - Topology: the benchmark side is SMALL by definition (eval suites are
  *    thousands-to-millions of items, not billions), so its exploded distinct
  *    n-gram set is [[broadcast]] — the corpus side, whose exploded grams are
  *    O(total tokens), is never shuffled: each partition probes the broadcast
  *    hash relation in place and only the (rare) matches flow into the
  *    group-by. A shuffle join here would move the entire tokenized corpus.
  *  - Gram-frequency skew (stop-word-heavy grams shared by millions of docs)
  *    therefore never concentrates on one task: matches stay on the corpus
  *    partition that produced them, and the final (doc, bench) group-by is
  *    keyed by doc pairs, not by gram.
  *  - Grams are matched as exact strings so every hit is auditable (the
  *    shared run is the join key itself) — UNLESS the benchmark side's gram
  *    count exceeds `maxBroadcastGrams`, in which case both sides join on
  *    `xxhash64(gram)` instead: same plan topology, 8 bytes per broadcast
  *    gram, at a ~5e-20 per-pair false-positive rate. The guard costs one
  *    cheap count over the (small by definition) benchmark side.
  */
object Decontamination {

  /** Distinct token n-gram set: whitespace tokenization (trim + split on
    * the RE2 `\s` class `[ \t\n\r\f]` — the explicit class shared with the
    * DuckDB twin's `string_split_regex`, deliberately excluding the
    * vertical tab that Java's `\s` would add), rolling n-token windows
    * re-joined with single spaces, de-duplicated. Null/blank-safe (→ empty
    * set); texts shorter than n tokens yield the empty set.
    *
    * Backed by the native codegen [[graft.functions.TokenNgramsExpr]] — the
    * equivalent `transform`/`slice`/`array_join`/`array_distinct` chain is
    * a higher-order function that Spark evaluates INTERPRETED, and the
    * corpus side of a decontamination sweep explodes O(total corpus tokens)
    * grams: the hottest per-row path of the whole sweep.
    */
  def tokenNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    graft.functions.TextExpressions.tokenNgrams(coalesce(text, lit("")), n)
  }

  /** Contamination pairs between a (doc_id, text) corpus and a
    * (doc_id, text) benchmark frame: one row per (corpus doc, benchmark doc)
    * pair sharing at least `minOverlap` distinct token n-grams, with the
    * shared-gram count. Output: (doc_id, bench_id, n_shared).
    *
    * `maxBroadcastGrams` guards the broadcast: if the benchmark side
    * explodes to more grams than this (a cheap count — the benchmark is
    * small by definition, and evals its grams once more before the join),
    * both sides switch to joining on `xxhash64(gram)` — the broadcast
    * relation shrinks to 8 bytes per gram and the plan topology is
    * unchanged (benchmark broadcast, corpus probes in place). The hashed
    * form trades the auditable string key for a ~5e-20 per-(corpus-gram ×
    * bench-gram) false-positive rate; at the default threshold the exact
    * strings are kept.
    */
  def contaminationPairsOf(corpus: DataFrame, benchmark: DataFrame,
      n: Int = 8, minOverlap: Int = 1,
      maxBroadcastGrams: Long = 50L * 1000 * 1000): DataFrame = {
    // spread the corpus side: tokenize+explode is the dominant per-row cost
    val c = spread(corpus).select($"doc_id",
      explode(tokenNgrams($"text", n)).as("gram"))
    val b = benchmark.select($"doc_id".as("bench_id"),
      explode(tokenNgrams($"text", n)).as("gram"))
    val benchGrams = b.agg(count(lit(1))).head.getLong(0)
    val (cKeyed, bKeyed) =
      if (benchGrams <= maxBroadcastGrams) (c, b)
      else (c.withColumn("gram", xxhash64($"gram")),
        b.withColumn("gram", xxhash64($"gram")))
    // each side's grams are distinct per doc, so count(*) after the join is
    // exactly |grams(doc) ∩ grams(bench)|
    cKeyed.join(broadcast(bKeyed), "gram")
      .groupBy($"doc_id", $"bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= minOverlap)
      .select($"doc_id", $"bench_id", $"n_shared")
  }

  /** A benchmark gram set prepared ONCE for repeated sweeps — the streaming
    * form's standing half. [[contaminationPairsOf]] re-explodes the
    * benchmark and re-runs the broadcast-guard count on every call; under a
    * micro-batch loop that is one redundant explode + one driver action per
    * trigger. Here the exploded (bench_id, gram) frame is persisted and
    * materialized up front, the hashed-vs-exact decision is taken once, and
    * every subsequent sweep just broadcasts the cached rows.
    *
    * Call [[PreparedBenchmark.unpersist]] when the stream stops. */
  final case class PreparedBenchmark(grams: DataFrame, hashed: Boolean,
      n: Int) {
    def unpersist(): Unit = { val _ = grams.unpersist() }
  }

  def prepareBenchmark(benchmark: DataFrame, n: Int = 8,
      maxBroadcastGrams: Long = 50L * 1000 * 1000): PreparedBenchmark = {
    val b = benchmark.select($"doc_id".as("bench_id"),
      explode(tokenNgrams($"text", n)).as("gram"))
    val hashed = b.agg(count(lit(1))).head.getLong(0) > maxBroadcastGrams
    val keyed = if (hashed) b.withColumn("gram", xxhash64($"gram")) else b
    val cached = keyed.persist()
    cached.count() // materialize now, not inside the first micro-batch
    PreparedBenchmark(cached, hashed, n)
  }

  /** [[contaminationPairsOf]] against a [[PreparedBenchmark]] — identical
    * output and topology (benchmark broadcast, corpus probes in place),
    * but the benchmark side is the cached frame: no re-explode, no guard
    * action. The per-sweep cost is exactly the corpus side's. */
  def contaminationPairsPrepared(corpus: DataFrame,
      bench: PreparedBenchmark, minOverlap: Int = 1): DataFrame = {
    val c0 = spread(corpus).select($"doc_id",
      explode(tokenNgrams($"text", bench.n)).as("gram"))
    val c = if (bench.hashed) c0.withColumn("gram", xxhash64($"gram")) else c0
    c.join(broadcast(bench.grams), "gram")
      .groupBy($"doc_id", $"bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= minOverlap)
      .select($"doc_id", $"bench_id", $"n_shared")
  }

  /** Registered query: sweep the fixture corpus against a held-out
    * "benchmark" slice of itself (every 10th doc), n=8 tokens. The oracle
    * brute-forces the same distinct-gram intersection in DuckDB. */
  def ngramContamination(spark: SparkSession, sfDir: String,
      n: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    contaminationPairsOf(
      docs.filter($"doc_id" % 10 =!= 0),
      docs.filter($"doc_id" % 10 === 0), n)
  }

  /** Split-leakage audit: before a release, measure n-gram overlap between
    * the train and test bands of [[Sampling.holdoutSplit]] — the check
    * that a heldout eval set is not contaminated by its own training
    * corpus. Same topology as the benchmark sweep ([[contaminationPairsOf]]
    * with the small test band broadcast, the train side never shuffled),
    * rolled up to the release-report numbers: leaking (train, test) pairs,
    * affected docs on each side, and total shared-gram volume.
    */
  def splitLeakage(spark: SparkSession, sfDir: String, n: Int = 8,
      valFrac: Double = 0.05, testFrac: Double = 0.05): DataFrame = {
    val withSplit = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text",
        Sampling.holdoutSplit($"doc_id", valFrac, testFrac).as("split"))
    val pairs = contaminationPairsOf(
      withSplit.filter($"split" === "train").select($"doc_id", $"text"),
      withSplit.filter($"split" === "test").select($"doc_id", $"text"), n)
    pairs.agg(
      count(lit(1)).as("n_leak_pairs"),
      count_distinct($"doc_id").as("n_train_docs"),
      count_distinct($"bench_id").as("n_test_docs"),
      sum($"n_shared").as("n_shared_grams"))
  }

  /** SEMANTIC contamination sweep — the embedding-space twin of the n-gram
    * check: a training vector is flagged when its cosine against ANY
    * benchmark vector reaches `threshold`. Published eval-hygiene pipelines
    * run both tiers — paraphrased benchmark items share no 8-gram run but
    * sit next to the original in embedding space.
    *
    * Same topology rule as [[contaminationPairsOf]]: the benchmark side is
    * small by definition, so its vectors [[broadcast]] and each corpus
    * partition scores its own rows in place (codegen cosine, no LSH needed —
    * the candidate-generation machinery in [[Dedup]] exists for
    * corpus×corpus pair spaces, not for a corpus×small-benchmark sweep).
    * The per-vec rollup groups by `vec_id`, whose partial aggregation
    * collapses each partition to ≤ one row per flagged vec before the (tiny,
    * flagged-subset-only) final exchange.
    *
    * Core over any (vec_id, embedding) corpus/benchmark pair of frames.
    */
  def semanticContaminationOf(corpus: DataFrame, benchmark: DataFrame,
      threshold: Double): DataFrame = {
    val c = graft.util.Cols.spread(corpus)
      .select($"vec_id", $"embedding").filter($"embedding".isNotNull)
    val b = benchmark
      .select($"vec_id".as("bench_id"), $"embedding".as("b_emb"))
      .filter($"b_emb".isNotNull)
    c.crossJoin(broadcast(b))
      .withColumn("cosine", round(Similarity.cosine($"embedding", $"b_emb"), 6))
      .filter($"cosine" >= threshold)
      .groupBy($"vec_id")
      .agg(count(lit(1)).as("n_bench_hits"), max($"cosine").as("max_cosine"))
  }

  /** Registered query: sweep the fixture embedding table against a held-out
    * "benchmark" slice of itself (every 10th vec — the same membership rule
    * as [[ngramContamination]]'s text-side slice). Threshold 0.35 sits below
    * the fixture's max pair cosine (≈0.51) so the report is non-trivial.
    * The oracle brute-forces the same rounded-cosine sweep in DuckDB. */
  def semanticContamination(spark: SparkSession, sfDir: String,
      threshold: Double = 0.35): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    semanticContaminationOf(
      emb.filter($"vec_id" % 10 =!= 0),
      emb.filter($"vec_id" % 10 === 0), threshold)
  }
}
