package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables
import graft.util.Cols._

/** Composed training-data pipelines: the operator families are most useful
  * chained, and this is the chain a real corpus build runs — deduplicate,
  * score, language-gate, emit the clean slice.
  */
object Pipelines {

  /** Clean-corpus selection: keep each exact-duplicate family's canonical
    * document, require a minimum quality score, and gate on detected
    * language.
    *
    * Plan shape: all three inputs key on doc_id, so after the first shuffle
    * the joins are co-partitioned (Catalyst reuses the exchange); the dedup
    * branch contributes one extra hash-agg shuffle on the content hash. At
    * 100 TB nothing here is pairwise — it is two hash-aggregates and
    * co-partitioned joins, all linear in the corpus.
    */
  def cleanCorpus(spark: SparkSession, sfDir: String,
      minQuality: Double = 0.45, lang: String = "en"): DataFrame = {
    val keep = Dedup.exactDedup(spark, sfDir)
      .select($"keep_doc_id".as("doc_id"))
    val quality = TextAnalysis.textStats(spark, sfDir)
      .select($"doc_id", $"quality_score")
    val language = TextAnalysis.langId(spark, sfDir)
      .select($"doc_id", $"lang_guess")
    keep
      .join(quality, "doc_id")
      .join(language, "doc_id")
      .filter($"quality_score" >= minQuality && $"lang_guess" === lang)
      .select($"doc_id", $"lang_guess", $"quality_score")
  }

  /** Near-dedup corpus pass: exact dedup (keep each content family's
    * canonical minimum doc_id) THEN near-dup removal (for every MinHash-LSH
    * pair at/above `threshold`, drop the higher doc_id). The drop rule is
    * deterministic over the pair set, so the result is engine-comparable.
    *
    * Plan shape: the exact branch is one hash-agg; the near branch is the
    * banded-LSH candidate join (never all-pairs, hot buckets capped); the
    * final combination is a left-anti join against the (small relative to
    * the corpus) drop set. All shuffles key on doc_id or the band keys —
    * nothing quadratic in the corpus survives to 100 TB.
    */
  def nearDedupCorpus(spark: SparkSession, sfDir: String,
      threshold: Double = 0.8): DataFrame = {
    val keep = Dedup.exactDedup(spark, sfDir)
      .select($"keep_doc_id".as("doc_id"))
    val drops = Dedup.nearDupPairs(spark, sfDir, threshold = threshold)
      .select($"b_doc_id".as("doc_id"))
      .distinct()
    Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"n_chars")
      .join(keep, "doc_id")
      .join(drops, Seq("doc_id"), "left_anti")
  }

  /** The RELEASE shape: [[cleanCorpus]]'s survivors (canonical, quality-
    * and language-gated) carrying PII-SCRUBBED text — the last mile before
    * a corpus leaves the pipeline. Published pre-training recipes run
    * exactly this order: select first, scrub last, so redaction cost is
    * paid only for documents that ship.
    *
    * Plan shape: the redaction branch is a shuffle-free per-row regex pass
    * ([[Pii.piiRedaction]]); the survivor set joins it on doc_id,
    * co-partitioned with [[cleanCorpus]]'s own joins. Linear in the corpus.
    */
  def redactedCorpus(spark: SparkSession, sfDir: String,
      minQuality: Double = 0.45, lang: String = "en"): DataFrame = {
    val survivors = cleanCorpus(spark, sfDir, minQuality, lang)
      .select($"doc_id")
    Pii.piiRedaction(spark, sfDir)
      .join(survivors, "doc_id")
      .select($"doc_id", $"n_emails", $"n_phones", $"n_ips", $"text_redacted")
  }

  /** The full pre-training corpus build: [[nearDedupCorpus]]'s exact+near
    * dedup chain, restricted to trainable (non-benchmark) documents, minus
    * everything the decontamination sweep flags against the benchmark slice
    * — dedup, then decontaminate, emit the training slice. This is the
    * end-to-end hygiene chain a real corpus build runs before tokenization.
    *
    * Plan shape: the dedup chain as in [[nearDedupCorpus]]; the
    * decontamination branch adds one broadcast probe over the corpus
    * (benchmark grams broadcast, corpus never shuffled) whose (small) hit
    * set lands in a second left-anti join on doc_id — co-partitioned with
    * the first. Still nothing quadratic in the corpus at 100 TB.
    */
  def decontaminatedCorpus(spark: SparkSession, sfDir: String,
      threshold: Double = 0.8, n: Int = 8): DataFrame = {
    val contaminated = Decontamination.ngramContamination(spark, sfDir, n)
      .select($"doc_id").distinct()
    nearDedupCorpus(spark, sfDir, threshold)
      .filter($"doc_id" % 10 =!= 0) // the benchmark slice is not trainable
      .join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Gopher-style quality-gated corpus: documents passing BOTH the
    * score-based gate ([[TextAnalysis.textStats]] quality_score) and the
    * repetition gates ([[TextAnalysis.repetitionStats]] — duplicate-line
    * fraction and top-bigram share below their thresholds). The published
    * pre-training recipes layer exactly these two families: a composite
    * quality score plus hard repetition cutoffs for boilerplate and
    * machine-generated text.
    *
    * Plan shape: both branches are shuffle-free per-row expression scans
    * keyed on doc_id, so the join is co-partitioned after one exchange —
    * linear in the corpus, nothing pairwise.
    */
  def qualityGatedCorpus(spark: SparkSession, sfDir: String,
      minQuality: Double = 0.45, maxDupLineFrac: Double = 0.3,
      maxTopBigramFrac: Double = 0.2): DataFrame = {
    val quality = TextAnalysis.textStats(spark, sfDir)
      .select($"doc_id", $"quality_score")
    val repetition = TextAnalysis.repetitionStats(spark, sfDir)
    quality
      .join(repetition, "doc_id")
      .filter($"quality_score" >= minQuality &&
        $"dup_line_frac" <= maxDupLineFrac &&
        $"top_bigram_frac" <= maxTopBigramFrac)
      .select($"doc_id", $"quality_score", $"dup_line_frac",
        $"top_bigram_frac")
  }

  /** The Lee-et-al RELEASE chain with sub-document surgery: exact+near
    * dedup → duplicated-SPAN trim over the surviving trainable documents →
    * decontamination of the TRIMMED text against the benchmark slice.
    * Stage order is the published one: doc-level dedup first (span
    * statistics are then computed over the deduplicated corpus, so a
    * 1000-copy boilerplate family contributes one vote, not a thousand),
    * span trim second, and the contamination sweep LAST over the text that
    * actually ships — a duplicated span that also matched a benchmark item
    * is gone by the time the sweep runs, so it cannot flag a document whose
    * offending text was already cut.
    *
    * Plan shape: the dedup chain as in [[nearDedupCorpus]]; the span stage
    * adds one hash-agg over hashed positional grams plus a broadcast-back
    * of the (small) duplicated-gram set; the sweep is the usual broadcast
    * probe (benchmark grams broadcast, trimmed corpus probes in place).
    * Every shuffle keys on doc_id or an 8-byte gram hash — linear in the
    * corpus at 100 TB.
    */
  def trimmedReleaseCorpus(spark: SparkSession, sfDir: String,
      threshold: Double = 0.8, spanN: Int = 8, minOccurrences: Int = 2,
      contamN: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val survivors = nearDedupCorpus(spark, sfDir, threshold)
      .filter($"doc_id" % 10 =!= 0) // the benchmark slice is not trainable
      .select($"doc_id")
    // Cut lineage at the two fan-out points (the dupClusters lesson): the
    // span stage references its input ~3× (gram count + covered probe +
    // re-join) and the sweep references the trimmed frame twice — without
    // the cuts each reference re-executes the whole upstream LSH dedup
    // chain from the scan up. localCheckpoint here; reliable checkpoint or
    // a persisted intermediate table on a cluster.
    val survivorDocs = docs.select($"doc_id", $"text").join(survivors, "doc_id")
      .localCheckpoint()
    val trimmed = DupSpans.spanTrimmedCorpusOf(survivorDocs, spanN, minOccurrences)
      .localCheckpoint()
    val benchmark = docs.filter($"doc_id" % 10 === 0).select($"doc_id", $"text")
    val contaminated = Decontamination.contaminationPairsOf(
      trimmed.select($"doc_id", $"text_trimmed".as("text")), benchmark, contamN)
      .select($"doc_id").distinct()
    trimmed.join(contaminated, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"n_tokens", $"n_dropped_tokens", $"text_trimmed")
  }

  /** The INGEST-day corpus build: where [[decontaminatedCorpus]] dedups a
    * corpus against itself, this is the shape a production pipeline runs
    * per incoming batch — dedup today's batch within itself (exact + near),
    * against the STANDING corpus via the persisted band index
    * ([[Dedup.writeBandIndex]] / [[Dedup.incrementalNearDupIndexed]]), and
    * decontaminate against the benchmark slice; emit the trainable batch
    * docs. Fixture roles: doc_id % 10 == 1 is today's batch, % 10 == 0 the
    * benchmark slice, everything else the standing corpus.
    *
    * Plan shape: one hash-agg (exact) + two banded-LSH candidate joins —
    * in-batch self-join and batch×index, the index side co-located and
    * never re-banded — + one broadcast contamination probe, with all four
    * drop sets landing in co-partitioned left-anti joins on doc_id. Every
    * stage is linear in the BATCH (plus one co-located index probe), never
    * in the standing corpus — the property that makes daily ingestion
    * affordable when the standing corpus is 100 TB and the batch is not.
    */
  def ingestedCorpus(spark: SparkSession, sfDir: String,
      threshold: Double = 0.8, n: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val batch = docs.filter($"doc_id" % 10 === 1)
    val standing = docs.filter($"doc_id" % 10 =!= 0 && $"doc_id" % 10 =!= 1)
    val benchmark = docs.filter($"doc_id" % 10 === 0)
    // standing-corpus band index: built once per process (the bench's
    // untimed warmup absorbs the build, mirroring the other index entries)
    val key = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val table = s"graft_ingest_band_index_$key"
    if (!spark.catalog.tableExists(table))
      Dedup.writeBandIndex(standing, table, location = Some(
        s"${graft.util.TmpDirs.perProcessDir("graft_ingest_bandidx")}/$key"))
    val keep = Dedup.exactDedupOf(batch)
      .select($"keep_doc_id".as("doc_id"))
    val inBatchDrops = Dedup.nearDupPairsOf(batch, threshold = threshold)
      .select($"b_doc_id".as("doc_id")).distinct()
    val corpusDrops = Dedup
      .incrementalNearDupIndexed(standing, table, batch, threshold = threshold)
      .select($"new_doc_id".as("doc_id")).distinct()
    val contaminated = Decontamination
      .contaminationPairsOf(batch, benchmark, n)
      .select($"doc_id").distinct()
    batch.select($"doc_id", $"lang", $"n_chars")
      .join(keep, "doc_id")
      .join(inBatchDrops, Seq("doc_id"), "left_anti")
      .join(corpusDrops, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")
      // ordered output: the index probe's candidate stage is an eagerly
      // materialized checkpoint, which makes raw row order run-dependent
      .orderBy($"doc_id")
  }

  /** The per-document RELEASE DECISION table — the audit artifact a curation
    * review actually reads: every trainable document with its quality score
    * and a single verdict, decided in the release chain's priority order
    * (dedup evidence beats contamination beats quality):
    *
    *   drop_exact_dup      — not its content family's canonical (min-id) doc
    *   drop_near_dup       — the higher side of a near-dup pair
    *   drop_contaminated   — shares an 8-gram run with the benchmark slice
    *   review_low_quality  — survives hygiene but scores under `minQuality`
    *   keep                — ships
    *
    * Where [[cleanCorpus]]/[[decontaminatedCorpus]] EMIT the surviving
    * slice, this emits the reasoning for every doc — the difference between
    * a filter and an audit. Composes the same shared stages (and the same
    * DuckDB CTE twins), so the decision table provably agrees with what the
    * release chain drops. All stages linear: two hash-aggs (content hash,
    * band key), broadcast probes, co-partitioned doc_id joins.
    */
  def curationDecisions(spark: SparkSession, sfDir: String,
      minQuality: Double = 0.45): DataFrame = {
    import org.apache.spark.sql.functions.{lit, when}
    val docs = Tables.documents(spark, sfDir)
    val trainable = docs.filter($"doc_id" % 10 =!= 0)
    val keepers = Dedup.exactDedup(spark, sfDir)
      .select($"keep_doc_id".as("doc_id")).withColumn("is_keeper", lit(1))
    val nearDrops = Dedup.nearDupPairs(spark, sfDir)
      .select($"b_doc_id".as("doc_id")).distinct()
      .withColumn("is_near_drop", lit(1))
    val contaminated = Decontamination.ngramContamination(spark, sfDir)
      .select($"doc_id").distinct().withColumn("is_contaminated", lit(1))
    val stats = TextAnalysis.textStats(spark, sfDir)
      .select($"doc_id", $"quality_score")
    trainable.select($"doc_id")
      .join(stats, "doc_id")
      .join(keepers, Seq("doc_id"), "left")
      .join(nearDrops, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .select($"doc_id", $"quality_score",
        when($"is_keeper".isNull, "drop_exact_dup")
          .when($"is_near_drop" === 1, "drop_near_dup")
          .when($"is_contaminated" === 1, "drop_contaminated")
          .when($"quality_score" < minQuality, "review_low_quality")
          .otherwise("keep").as("verdict"))
  }
}
