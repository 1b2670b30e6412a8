package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols._

/** Dataset profiling — the data-quality audit a pipeline runs before and
  * after every corpus build: per-column null counts, distinct counts, and
  * value ranges (builder-brief extension; no reference analogue).
  *
  * One scan computes every column's aggregates side by side (Spark plans
  * the distinct aggregates with Expand — still a single pass over the
  * data), and the wide single-row result is stacked to long form
  * driver-side-free with `stack`. At 100 TB the exact distinct counts are
  * the only heavy term (each adds an Expand replica of the scan); swap
  * `count_distinct` for `approx_count_distinct` there — same call shape,
  * HLL state (the same exact-vs-sketch split as distinct_parts /
  * distinct_parts_approx).
  *
  * min/max are emitted as strings so one long-form schema serves every
  * column type; restrict to non-float columns (float→string rendering is
  * engine-specific, and a profile of floats wants quantiles anyway —
  * [[EventAnalytics.valueQuantiles]]).
  */
object Profile {

  /** Long-form profile of `cols`: (column, n_nulls, n_distinct, min_value,
    * max_value), one row per profiled column, computed in one scan. */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs = cols.flatMap { c =>
      Seq((count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    wide.selectExpr(
      s"stack(${cols.length}, $stacked) AS (column, n_nulls, n_distinct, min_value, max_value)")
  }

  /** Registered query: the documents-table profile (every non-float column). */
  def documentsProfile(spark: SparkSession, sfDir: String): DataFrame =
    tableProfile(Tables.documents(spark, sfDir),
      Seq("doc_id", "text", "lang", "source", "n_chars"))

  /** Corpus SNAPSHOT DIFF — the release-to-release audit: given two
    * versions of a (doc_id, text) corpus, classify every document as
    * `added` (new only), `removed` (old only), `changed` (both, content
    * hash differs), or `unchanged`. Content identity is sha256(text), so
    * the diff detects edits, not just membership churn.
    *
    * One full-outer join co-partitioned on doc_id — linear in the larger
    * snapshot, the exact shape a 100 TB version bump runs (in production
    * both sides would be bucketed on doc_id, making the join
    * exchange-free).
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = oldDocs.select($"doc_id",
      sha2(coalesce($"text", lit("")), 256).as("old_hash"))
    val n = newDocs.select($"doc_id",
      sha2(coalesce($"text", lit("")), 256).as("new_hash"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select($"doc_id",
        when($"old_hash".isNull, "added")
          .when($"new_hash".isNull, "removed")
          .when($"old_hash" === $"new_hash", "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Registered query: diff the raw documents table (old snapshot) against
    * its planted-PII variant ([[Pii.plantedDocs]], the new snapshot) with
    * every 7th document dropped — a deterministic fixture exercising all
    * four statuses (drops → removed, planting appendices → changed,
    * untouched ids → unchanged; `added` exercised in spec with a synthetic
    * frame since both snapshots here share the id space).
    */
  def documentsDiff(spark: SparkSession, sfDir: String): DataFrame =
    corpusDiff(
      Tables.documents(spark, sfDir),
      Pii.plantedDocs(spark, sfDir).filter($"doc_id" % 7 =!= 0)
        .select($"doc_id", $"txt".as("text")))

  /** Registered query: the per-SOURCE curation report — the decision table
    * a corpus owner reads to decide which sources to keep, cap, or drop:
    * document and token volume, how many docs are exact duplicates
    * (identity = text content, keeper = min doc_id, the
    * [[Dedup.exactDedupOf]] contract), how many carry benchmark
    * contamination (the [[Decontamination.ngramContamination]] sweep), and
    * quality mass. Quality travels as exact integer 1e-4 units of the
    * already-4-dp-rounded score, so the per-source sum is
    * order-independent where a raw double sum would not be.
    *
    * Topology: three linear passes joined on doc_id (co-partitioned
    * hash joins), one per-source hash-agg; the contamination side is the
    * broadcast benchmark sweep. Nothing quadratic, nothing global-sorts.
    */
  def sourceCurationReport(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text")
    val stats = TextAnalysis.textStatsOf(docs)
      .select($"doc_id", $"n_tokens", $"quality_score")
    val keepers = Dedup.exactDedupOf(docs)
      .select($"keep_doc_id".as("doc_id"), lit(1).as("is_keeper"))
    val contaminated = Decontamination.ngramContamination(spark, sfDir)
      .select($"doc_id").distinct()
      .select($"doc_id", lit(1).as("is_contam"))
    docs
      .join(stats, "doc_id")
      .join(keepers, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"is_keeper".isNull, 1L).otherwise(0L)).as("n_exact_dup_docs"),
        sum(coalesce($"is_contam", lit(0)).cast("long")).as("n_contaminated_docs"),
        sum($"n_tokens").as("sum_tokens"),
        sum(round($"quality_score" * 1e4).cast("long")).as("sum_quality_units"))
      .orderBy($"source")
  }

  /** Registered query: the embedding-table twin of [[documentsProfile]] —
    * the per-label audit an embedding pipeline gates on before indexing:
    * row counts, dimension bounds (a ragged dim is a broken encoder
    * export), zero-norm and NaN counts (dead or poisoned vectors), and
    * L2-norm mass/extremes (an un-normalized batch shifts these).
    *
    * One hash-agg over a narrow projection; nothing shuffles but the
    * per-label partials. Determinism: squares are computed in DOUBLE on
    * both engines (the float element is cast before multiplying — a
    * float×float square rounds differently), per-row norms are rounded at
    * 6 dp (IEEE sqrt is correctly rounded, so the engines agree to the
    * ulp), and the norm aggregate travels as exact integer micros — the
    * min/max of identical rounded sets are order-safe, a raw double sum
    * would not be. */
  def embeddingProfile(spark: SparkSession, sfDir: String): DataFrame =
    embeddingProfileOf(Tables.embeddings(spark, sfDir))

  /** [[embeddingProfile]] over any (label, embedding) frame — the form an
    * ingest micro-batch feeds before touching the index. */
  def embeddingProfileOf(embs: DataFrame): DataFrame = {
    val sq = aggregate(
      transform($"embedding", x => x.cast("double")),
      lit(0d), (acc, x) => acc + x * x)
    // a NaN element poisons the norm: report it via n_nan and carry the
    // norm as NULL so every norm aggregate (min/max/micros-sum) skips it
    // identically in both engines — an ANSI cast of NaN to long would
    // throw, and NaN min/max ordering differs between engines
    val hasNan = exists($"embedding", x => isnan(x))
    embs
      .select($"label",
        size($"embedding").cast("long").as("dim"),
        when(!hasNan, round(sqrt(sq) + 1e-9, 6)).as("norm"),
        hasNan.as("has_nan"))
      .groupBy($"label")
      .agg(
        count(lit(1)).as("n_vecs"),
        min($"dim").as("min_dim"),
        max($"dim").as("max_dim"),
        sum(when($"norm" < 1e-4, 1L).otherwise(0L)).as("n_zero"),
        sum(when($"has_nan", 1L).otherwise(0L)).as("n_nan"),
        sum(round($"norm" * 1e6).cast("long")).as("sum_norm_micros"),
        min($"norm").as("min_norm"),
        max($"norm").as("max_norm"))
      .orderBy($"label")
  }

  /** Vocabulary DRIFT report: the top terms by add-one-smoothed KL
    * contribution between the ingest batch (doc_id % 10 = 1, the
    * [[Pipelines.ingestedCorpus]] split) and the standing corpus — the
    * distribution-shift alarm a continuously-fed pipeline reads before
    * letting a batch in (a scraper gone wrong shows up here before it
    * shows up in eval loss).
    *
    * Exactness (the BM25/LM discipline): term counts are exact integers
    * from ONE conditional hash-agg; the log ratio
    * ln((tf_b+1)(T_c+V) / ((tf_c+1)(T_b+V))) micro-quantizes per TERM
    * (vocabulary-sized libm exposure); each contribution is then the same
    * double dag (tf_b+1)·ln_micros/(T_b+V) over exact integers in both
    * engines. Scalars (T_b, T_c, V) are one bounded 1-row collect.
    * Top-k by |contribution| is a TakeOrderedAndProject.
    */
  def vocabDrift(spark: SparkSession, sfDir: String, topK: Int = 20): DataFrame = {
    val toks = graft.util.Cols.spread(Tables.documents(spark, sfDir))
      .select(($"doc_id" % 10 === 1).as("in_batch"),
        explode(TextAnalysis.tokens($"text")).as("term"))
    val counts = toks.groupBy($"term").agg(
      sum(when($"in_batch", 1L).otherwise(0L)).as("tf_b"),
      sum(when($"in_batch", 0L).otherwise(1L)).as("tf_c"))
    val Seq(tB, tC, v) = {
      val r = counts.agg(sum($"tf_b"), sum($"tf_c"), count(lit(1))).head()
      Seq(r.getLong(0), r.getLong(1), r.getLong(2))
    }
    counts
      .withColumn("ln_micros", round(
        log((($"tf_b" + 1L) * lit(tC + v)).cast("double") /
          (($"tf_c" + 1L) * lit(tB + v)).cast("double")) * 1e6).cast("long"))
      .withColumn("drift_micros", round(
        (($"tf_b" + 1L) * $"ln_micros").cast("double") / lit((tB + v).toDouble))
        .cast("long"))
      .select($"term", $"tf_b", $"tf_c", $"drift_micros")
      .orderBy(abs($"drift_micros").desc, $"term")
      .limit(topK)
  }
}
