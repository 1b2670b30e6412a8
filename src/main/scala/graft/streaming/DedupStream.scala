package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.{Decontamination, Dedup}
import graft.util.Cols._

/** Streaming twin of the incremental dedup family: micro-batches of new
  * documents probe the PERSISTED band index ([[Dedup.writeBandIndex]] /
  * [[Dedup.appendToBandIndex]]) exactly like the batch
  * [[Dedup.incrementalNearDupIndexed]] — this is the `foreachBatch` shape
  * ([[EventStreams.purchaseClickPairs]] is the stateful-join sibling), and
  * it completes the ingest story the incremental family exists for: a
  * firehose of new documents continuously deduped against the standing
  * corpus.
  *
  * Why `foreachBatch` and not a stateful streaming join: the standing side
  * is a 100 TB on-disk index, not stream state — per micro-batch the probe
  * is a BATCH join against the bucketed table (index side co-located, zero
  * exchange; only the micro-batch shuffles), which is both the scale-correct
  * topology and restart-safe (foreachBatch re-runs the batch id on recovery;
  * the probe is deterministic over (batch, index)).
  */
object DedupStream {

  /** Configure (not start) a streaming query over `stream` — micro-batches
    * of (doc_id, text) — that probes `indexTable` per batch and hands the
    * resulting (new_doc_id, dup_of_doc_id, jaccard) pairs to `sink`.
    *
    * `corpus` supplies the TEXT of standing documents for the exact-Jaccard
    * verify and must cover every doc in the index; it is re-planned per
    * micro-batch (the stream-static property), so passing a catalog table
    * that grows with the index keeps the verify side consistent.
    *
    * With `appendAfterProbe`, each batch's own bands are appended to the
    * index after its probe ([[Dedup.appendToBandIndex]], union-capped), so
    * later batches dedup against earlier ones too — probe-then-ingest, the
    * daily pipeline's inner loop. Exactly-once caveat: a batch replayed
    * after a crash between probe and append would append its bands twice;
    * production sinks should append under the batch id (idempotent overwrite
    * of a per-batch partition) or dedup the index by (doc_id, band).
    *
    * With `exactTable`, the probe runs TIERED
    * ([[Dedup.tieredIncrementalNearDupIndexed]]): the batch's exact
    * re-fetches resolve against the bucketed exact-hash index with one
    * co-located equi-join (pairs at jaccard 1.0, first-tier-wins) and only
    * docs with no exact twin pay the band explode — the firehose cost
    * profile, since a crawl stream is heavy with byte-identical re-fetches.
    * `appendAfterProbe` then maintains BOTH standing indexes.
    */
  def incrementalDedupQuery(stream: DataFrame, corpus: DataFrame,
      indexTable: String, shingleLen: Int = 5, numBands: Int = 128,
      rowsPerBand: Int = 8, threshold: Double = 0.8,
      appendAfterProbe: Boolean = false, buckets: Int = 0,
      maxBucketSize: Int = 1000, exactTable: Option[String] = None)
      (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Survive a concurrent [[Dedup.rebuildBandIndex]]: the probe's
        // candidate stage materializes eagerly (localCheckpoint inside
        // incrementalNearDupIndexed / the tiered form), so every index
        // read — catalog resolution AND the bucketed scan — happens
        // inside this call; a trigger racing the metastore drop-rename
        // gap (TABLE_NOT_FOUND) or the old data directory's retirement
        // (FileNotFound mid-scan) retries ONCE against the re-resolved
        // table, which the swap protocol guarantees is fully materialized
        // — the same retry-once contract as the IVF serving loop. The
        // lazy remainder (the exact-Jaccard verify) joins only the
        // caller's corpus/batch frames, never the swapped table.
        def probe(): DataFrame = exactTable match {
          case Some(et) => Dedup.tieredIncrementalNearDupIndexed(corpus,
            indexTable, et, batch, shingleLen, numBands, rowsPerBand,
            threshold)
          case None => Dedup.incrementalNearDupIndexed(corpus, indexTable,
            batch, shingleLen, numBands, rowsPerBand, threshold)
        }
        val pairs =
          try probe()
          catch {
            case scala.util.control.NonFatal(_) =>
              // re-resolve THROUGH the micro-batch session's relation
              // cache: foreachBatch runs in a cloned session whose cached
              // table entry can outlive a rebuild/compaction swap — the
              // outer session's metastore ops invalidate only its own
              // cache, so a retry without the refresh would list the
              // retired files again and fail the same way
              batch.sparkSession.catalog.refreshTable(indexTable)
              exactTable.foreach(batch.sparkSession.catalog.refreshTable)
              probe()
          }
        sink(pairs, batchId)
        if (appendAfterProbe) {
          Dedup.appendToBandIndex(batch, indexTable, shingleLen, numBands,
            rowsPerBand, buckets, maxBucketSize)
          exactTable.foreach(et => Dedup.appendToExactIndex(batch, et,
            shingleLen, buckets, maxBucketSize))
        }
      }

  /** Streaming twin of SEMANTIC (embedding) incremental dedup — the
    * [[incrementalDedupQuery]] shape over the sign-LSH embedding band index
    * ([[Dedup.writeEmbeddingBandIndex]] / [[Dedup.appendToEmbeddingBandIndex]]):
    * micro-batches of (vec_id, embedding) probe the persisted index
    * ([[Dedup.incrementalEmbeddingNearDupIndexed]] — index side co-located,
    * only the batch shuffles, exact-cosine verify candidate-bounded) and
    * hand (new_vec_id, dup_of_vec_id, cosine) to `sink`. With
    * `appendAfterProbe` each batch's bands join the index after its probe,
    * so later batches dedup against earlier ones — the embedding firehose's
    * probe-then-ingest loop (same exactly-once caveat as the text twin).
    *
    * `corpus` supplies standing vectors for the verify and must cover every
    * vec in the index; stream-static, re-planned per micro-batch.
    */
  def incrementalEmbeddingDedupQuery(stream: DataFrame, corpus: DataFrame,
      indexTable: String, threshold: Double = 0.4, numBands: Int = 64,
      rowsPerBand: Int = 2, dim: Int = 64, seed: Long = 7L,
      appendAfterProbe: Boolean = false, buckets: Int = 0,
      maxBucketSize: Int = 1000)
      (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        def probe(): DataFrame = Dedup.incrementalEmbeddingNearDupIndexed(
          corpus, indexTable, batch, threshold, numBands, rowsPerBand, dim,
          seed)
        val pairs = // retry-once across a rebuild swap (see the text twin)
          try probe()
          catch {
            case scala.util.control.NonFatal(_) =>
              batch.sparkSession.catalog.refreshTable(indexTable)
              probe()
          }
        sink(pairs, batchId)
        if (appendAfterProbe)
          Dedup.appendToEmbeddingBandIndex(batch, indexTable, numBands,
            rowsPerBand, dim, seed, buckets, maxBucketSize)
      }

  /** Streaming PERCEPTUAL dedup — the media-firehose twin of
    * [[incrementalDedupQuery]] over a persisted 64-bit-signature hash
    * index ([[Dedup.writeHashIndex]] / [[Dedup.appendToHashIndex]]):
    * micro-batches of (id, sig) rows — any modality's perceptual hash
    * (image aHash, audio fingerprint, video temporal hash, text SimHash),
    * computed upstream as a per-row stage — probe the standing index
    * ([[Dedup.hammingIndexProbe]], index side co-located, only the batch
    * shuffles, exact bit_count verify) and hand (new_id, dup_of_id,
    * hamming) to `sink`. With `appendAfterProbe` each batch's chunks join
    * the index (union-re-capped), so later batches dedup against earlier
    * arrivals — probe-then-ingest with the same exactly-once caveat as the
    * text twin.
    */
  def hashDedupQuery(stream: DataFrame, indexTable: String,
      idCol: String = "id", sigCol: String = "sig", numChunks: Int = 8,
      maxHamming: Int = 6, appendAfterProbe: Boolean = false,
      buckets: Int = 0, maxBucketSize: Int = 1000)
      (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val pairs = Dedup.hammingIndexProbe(indexTable, batch, idCol,
          sigCol, numChunks, maxHamming, maxBucketSize)
        sink(pairs, batchId)
        if (appendAfterProbe)
          Dedup.appendToHashIndex(batch, idCol, sigCol, indexTable,
            numChunks, buckets, maxBucketSize)
      }

  /** Streaming twin of the Bloom-prefiltered EXACT tier
    * ([[Dedup.bloomIncrementalDedupOf]]): the standing corpus is aggregated
    * ONCE into a driver-held sketch (`df.stat.bloomFilter` — Spark's
    * distributed tree-aggregated build, never a collect of the corpus);
    * each micro-batch probes the sketch as a plan LITERAL (the other build
    * form `might_contain` accepts), probe-positive candidates broadcast
    * back against the standing corpus for the exact verify, and the
    * certainly-new survivors go to `sink`. Per batch nothing shuffles —
    * the batch-operator topology, amortized: the corpus is read once per
    * QUERY, not once per batch (the stream-static band-index argument,
    * with the index shrunk to numBits/8 bytes of driver state).
    *
    * With `accumulate`, each batch's survivor hashes merge into the sketch
    * (distributed per-batch build + `mergeInPlace`, O(1) driver state), so
    * later batches also drop dups of earlier survivors. Cross-batch
    * semantics are SKETCH-EVIDENCE: a true dup of an earlier survivor is
    * always dropped (Bloom has no false negatives), while a new doc is
    * falsely dropped with probability ≤ fpp — the standard bounded-state
    * streaming-dedup trade (exact unbounded state is what
    * `dropDuplicates` + watermark buys; this is the O(1)-state tier for
    * corpus-scale histories). Standing-corpus drops stay EXACT: they are
    * verified against the corpus before dropping.
    */
  def bloomDedupQuery(stream: DataFrame, corpus: DataFrame,
      expectedItems: Long = 1000000L, fpp: Double = 0.000001,
      accumulate: Boolean = false)
      (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val hashOf = sha2(coalesce($"text", lit("")), 256)
    val keyed = xxhash64(hashOf)
    val corpusHashes = corpus.select(hashOf.as("text_hash"))
    val standing = corpusHashes.stat
      .bloomFilter(xxhash64($"text_hash"), expectedItems, fpp)
    def sketchBytes(): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      standing.writeTo(bos)
      bos.toByteArray
    }
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val probe = graft.functions.Bloom.mightContain(
          lit(sketchBytes()), keyed)
        val candidates = batch.filter(probe)
          .select(hashOf.as("text_hash")).distinct()
        val confirmed = corpusHashes
          .join(broadcast(candidates), "text_hash").distinct()
        val survivors = batch
          // certainly new (sketch miss) OR sketch hit that the standing
          // corpus disowns — unless accumulating, where an unconfirmed hit
          // reads as "dup of an earlier survivor" and drops on sketch
          // evidence
          .withColumn("text_hash", hashOf)
          .join(broadcast(confirmed), Seq("text_hash"), "left_anti")
        val shipped =
          if (!accumulate) survivors.drop("text_hash")
          else survivors.filter(!probe).drop("text_hash")
        sink(shipped, batchId)
        if (accumulate && !shipped.isEmpty) {
          standing.mergeInPlace(shipped.stat
            .bloomFilter(keyed, expectedItems, fpp))
          ()
        }
      }
  }

  /** Streaming decontamination — the benchmark-hygiene twin of
    * [[incrementalDedupQuery]]: micro-batches of (doc_id, text) sweep
    * against a [[Decontamination.PreparedBenchmark]] (exploded, keyed and
    * cached ONCE up front — the standing side of this stream; a naive
    * per-batch [[Decontamination.contaminationPairsOf]] would re-explode
    * the benchmark and re-run its broadcast-guard driver action on every
    * trigger) and hand the (doc_id, bench_id, n_shared) contamination
    * pairs to `sink`. Per batch the plan is: explode the batch's grams,
    * probe the broadcast benchmark relation in place, group by the (rare)
    * matching pairs — the batch never shuffles its full gram stream.
    *
    * The benchmark is FROZEN for the stream's lifetime, which is the
    * production contract (eval suites version discretely; a new suite is a
    * new prepared frame and a stream restart). */
  def decontaminationQuery(stream: DataFrame,
      bench: Decontamination.PreparedBenchmark, minOverlap: Int = 1)
      (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(Decontamination
          .contaminationPairsPrepared(batch, bench, minOverlap), batchId)
      }

  /** The full streaming ingest pipeline — the per-micro-batch form of
    * [[graft.operators.Pipelines.ingestedCorpus]]: each batch of documents
    * is exact-deduped within itself, near-deduped within itself and against
    * the standing corpus (persisted band index probe), decontaminated
    * against the benchmark frame, and the SURVIVING rows (all input
    * columns) handed to `sink`; with `appendAfterProbe` the survivors'
    * bands then join the index, so later batches dedup against them too.
    * `minQuality` adds the Gopher-style score gate
    * ([[graft.operators.TextAnalysis.textStatsOf]]) after the dedup
    * stages, and `redactPii` scrubs the sink rows' text
    * ([[graft.operators.Pii.redactPii]]) in the select-first/scrub-last
    * release order of [[graft.operators.Pipelines.redactedCorpus]] — the
    * band index is appended from the PRE-redaction survivors, so the
    * standing corpus tracks content identity of text as ingested and a
    * re-arriving raw duplicate still collides.
    *
    * Cross-batch semantics with the append enabled: an exact or near dup
    * of an EARLIER batch's surviving doc is caught by the index probe
    * (exact dups have Jaccard 1 ≥ any threshold), so "first arrival wins"
    * replaces the batch chain's "minimum doc_id wins" — identical when
    * ingestion order follows doc_id. Only survivors are appended: a doc
    * dropped as contaminated never becomes dedup precedent, which batch
    * [[graft.operators.Pipelines.ingestedCorpus]] — which drops the higher
    * side of EVERY in-slice pair regardless of the lower side's fate —
    * does not exactly share; the streaming rule is the one a day-over-day
    * pipeline actually wants (nothing in the corpus ever references a
    * dropped doc).
    *
    * `preparedBench` (when set) replaces the per-trigger benchmark
    * explode with the once-cached [[Decontamination.PreparedBenchmark]]
    * frame — prepare it with the same `n` as this query's.
    */
  def ingestQuery(stream: DataFrame, corpus: DataFrame, indexTable: String,
      benchmark: DataFrame, shingleLen: Int = 5, numBands: Int = 128,
      rowsPerBand: Int = 8, threshold: Double = 0.8, n: Int = 8,
      appendAfterProbe: Boolean = true, buckets: Int = 0,
      maxBucketSize: Int = 1000, minQuality: Double = Double.NegativeInfinity,
      redactPii: Boolean = false, trimSpans: Boolean = false,
      spanN: Int = 8, spanMinOccurrences: Int = 2,
      lineRules: Option[graft.operators.LineClean.Rules] = None,
      classifierGate: Option[(Double, Array[Double], Double)] = None,
      normalizedExact: Boolean = false,
      preparedBench: Option[Decontamination.PreparedBenchmark] = None)
      (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        // optional C4 line tier FIRST, as in the batch composition order
        // (clean → dedup): page drops and line trims happen before any
        // hashing, so the content identity the index tracks is the text
        // that would ship — a re-arriving raw page re-cleans to the same
        // text and still collides. Shuffle-free per-row stage.
        val batch = lineRules.map { r =>
          graft.operators.LineClean
            .cleanLines(rawBatch.select($"doc_id", $"text"), r)
            .select($"doc_id", $"cleaned_text".as("text"))
        }.getOrElse(rawBatch)
        // `normalizedExact` swaps the exact tier for the C4 fuzzy-exact
        // form ([[graft.operators.Dedup.normalizedDedupOf]]): formatting
        // variants (casing/punctuation/whitespace) collapse in-batch at
        // identical cost. The BAND index still hashes raw text either way
        // — near-dup shingles already absorb formatting drift, and the
        // index's content-identity contract stays one thing.
        val keep = (if (normalizedExact) Dedup.normalizedDedupOf(batch)
          else Dedup.exactDedupOf(batch))
          .select($"keep_doc_id".as("doc_id"))
        val inBatchDrops = Dedup
          .nearDupPairsOf(batch, shingleLen, numBands, rowsPerBand, threshold)
          .select($"b_doc_id".as("doc_id")).distinct()
        val corpusDrops = Dedup
          .incrementalNearDupIndexed(corpus, indexTable, batch, shingleLen,
            numBands, rowsPerBand, threshold)
          .select($"new_doc_id".as("doc_id")).distinct()
        val deduped = batch
          .join(keep, "doc_id")
          .join(inBatchDrops, Seq("doc_id"), "left_anti")
          .join(corpusDrops, Seq("doc_id"), "left_anti")
        // optional Lee-et-al duplicated-span trim, in the batch release
        // chain's order (Pipelines.trimmedReleaseCorpus): AFTER doc-level
        // dedup (span statistics see each surviving family once), BEFORE
        // the contamination sweep, which then runs over the text that
        // ships. Per micro-batch the gram counts are in-batch — the
        // streaming analogue of "over the survivors".
        // lineage cut when trimming: the span stage references its input
        // ~3× and the index append re-reads it once more — each reference
        // would otherwise re-run the index probe above
        val dedupedCut = if (trimSpans) deduped.localCheckpoint() else deduped
        val trimmed =
          if (!trimSpans) dedupedCut
          else dedupedCut.drop("text").join(
            graft.operators.DupSpans
              .spanTrimmedCorpusOf(dedupedCut.select($"doc_id", $"text"),
                spanN, spanMinOccurrences)
              .select($"doc_id", $"text_trimmed".as("text")),
            "doc_id")
        // the sweep probes the CURRENT text (trimmed when enabled) — a
        // duplicated span that also matched a benchmark item is gone by
        // the time the sweep runs, so it cannot flag the document
        // a prepared benchmark (same grams, cached once) skips the
        // per-trigger benchmark re-explode + broadcast-guard action
        val contaminated = preparedBench.map(pb => Decontamination
            .contaminationPairsPrepared(trimmed, pb))
          .getOrElse(Decontamination.contaminationPairsOf(trimmed, benchmark, n))
          .select($"doc_id").distinct()
        val clean = trimmed
          .join(contaminated, Seq("doc_id"), "left_anti")
        // optional Gopher-style quality gate (shuffle-free per-row scoring;
        // the same gate Pipelines.cleanCorpus applies batch-side)
        val heuristicGated =
          if (minQuality == Double.NegativeInfinity) clean
          else clean.join(
            graft.operators.TextAnalysis.textStatsOf(clean)
              .filter($"quality_score" >= minQuality).select($"doc_id"),
            "doc_id")
        // optional FROZEN-MODEL gate (the production pattern: the
        // classifier trains offline, micro-batches score with the fixed
        // coefficient literals — one shuffle-free projection per batch)
        val gated = classifierGate.map { case (b, w, minMargin) =>
          heuristicGated.join(
            graft.ml.QualityClassifier
              .features(heuristicGated.select($"doc_id", $"text"))
              .filter(graft.ml.QualityClassifier.marginWith(b, w) >= minMargin)
              .select($"doc_id"),
            "doc_id")
        }.getOrElse(heuristicGated)
        // select-first/scrub-last (the redacted_corpus release order): the
        // sink receives scrubbed text, while the band index is appended
        // from the PRE-redaction survivors — the standing corpus tracks
        // content identity of the text as ingested, so a re-arriving raw
        // duplicate still collides with it
        val out =
          if (redactPii)
            gated.withColumn("text", graft.operators.Pii.redactPii($"text"))
          else gated
        sink(out, batchId)
        // the index is appended from the survivors' AS-INGESTED text (pre
        // trim, pre redaction) — the standing corpus tracks content
        // identity of arriving documents, so a re-arriving raw duplicate
        // of a trimmed survivor still collides with it
        if (appendAfterProbe) {
          val appendRows =
            if (trimSpans) dedupedCut.join(gated.select($"doc_id"), "doc_id")
            else gated
          Dedup.appendToBandIndex(appendRows, indexTable, shingleLen,
            numBands, rowsPerBand, buckets, maxBucketSize)
        }
      }
}
