package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ml.TextClustering
import graft.operators.{AsOf, Bpe, Decontamination, Dedup, Dsir, DupSpans, EventAnalytics, LineClean, NgramLm, Pii, Pipelines, Pq, Profile, RangeJoin, Reference, Relational, Sampling, Similarity, Skew, Sq, TextAnalysis, TokenizerAudit, UnigramLm, Wordpiece}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a deterministic DataFrame plan over the
  * driver fixture tables; entries with a DuckDB-expressible equivalent have a
  * matching [[oracleSql]] row (same column names, same ORDER BY) for the
  * hash-compare gate. Non-SQL-expressible ops (LSH, KMeans, ...) appear in
  * [[queries]] only → rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Reference.groupByTextCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 — every entry
    * routed through the scale-adaptive session tuning prelude
    * ([[graft.util.Tune.ensureSession]]: one memoized metadata call per
    * (session, dir), derives the shuffle-partition count from the input's
    * measured size). The wrapper changes no plan and no result;
    * it only sets session confs the same way for every entry. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rawQueries.map { case (n, f) =>
      n -> { (s: SparkSession, d: String) =>
        graft.util.Tune.ensureSession(s, d); f(s, d) }
    }

  private def rawQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // —— reference parity (SURVEY.md §2.2-2.5) ——
    "scan_count" -> (Reference.scanCount _),
    "groupby_text_count" -> (Reference.groupByTextCount _),
    "select_text_notnull_limit" -> (Reference.selectTextNotNullLimit _),
    "lang_filter_fr" -> (Reference.langFilterFr _),
    "sanitize_projection" -> (Reference.sanitizeProjection _),
    "row_strings" -> (Reference.rowStrings _),
    "timestamp_format" -> (Reference.timestampFormat _),
    "encode_pipe_line" -> (Reference.encodePipeLine _),
    // —— relational core / bench headliners ——
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q3_top_revenue" -> (Relational.q3TopRevenue _),
    "q5_nation_revenue" -> (Relational.q5NationRevenue _),
    "top_orders_per_priority" -> (Relational.topOrdersPerPriority _),
    "distinct_parts" -> (Relational.distinctParts _),
    "distinct_parts_approx" -> ((s, d) => Relational.distinctPartsApprox(s, d)), // rows-only (sketch)
    "distinct_parts_envelope" -> ((s, d) => Relational.distinctPartsEnvelope(s, d)), // hash-checked sketch error bound
    "customers_without_orders" -> (Relational.customersWithoutOrders _),
    "orders_above_cust_avg" -> (Relational.ordersAboveCustAvg _),
    "repeat_customers" -> (Relational.repeatCustomers _),
    "rolling_customer_spend" -> (Relational.rollingCustomerSpend _),
    // skew mitigation: salted fact-side join and member-salted
    // count-distinct — pure plan rewrites, results bit-equal to the plain
    // forms (the oracles ARE the plain SQL)
    "skew_salted_join" -> ((s, d) => Skew.skewSaltedJoin(s, d)),
    "salted_distinct_users" -> ((s, d) => Skew.saltedDistinctUsers(s, d)),
    // Z-order layout: Morton codes (mask-spread interleave, pure codegen
    // integer ops) + the per-bucket bounding-box locality audit
    "zorder_values" -> ((s, d) => graft.operators.ZOrder.zorderValues(s, d)),
    "zorder_locality" -> ((s, d) => graft.operators.ZOrder.zorderLocality(s, d)),
    // the data-skipping CONSUMER of the Z-order layout: per-file zone map
    // (row count + key bounding box), 2-D range probe reads ONLY the
    // overlapping files. Oracle = the PLAIN filter — hash equality IS the
    // no-lost-row/no-duplicate skipping contract; the files-skipped claim
    // is layout-dependent and lives in spec:ZOrderSpec
    "zonemap_pruned_scan" -> ((s, d) => graft.operators.ZOrder.zonemapPrunedScan(s, d)),
    // per-source distinct-token cardinality: exact anchor + mergeable
    // DataSketches HLL tier (fixed 4 KiB/sketch; per-shard sketches union
    // losslessly — SketchesSpec pins the merge identity)
    "source_token_cardinality" -> ((s, d) => graft.operators.Sketches.sourceTokenCardinality(s, d)),
    "source_token_cardinality_hll" -> ((s, d) => graft.operators.Sketches.sourceTokenCardinalityHll(s, d)), // rows-only (sketch)
    "token_cardinality_envelope" -> ((s, d) => graft.operators.Sketches.sourceTokenCardinalityEnvelope(s, d)), // hash-checked sketch error bound
    "user_type_pivot" -> (Relational.userTypePivot _),
    // —— event analytics (streaming twins in graft.streaming.EventStreams) ——
    "events_hourly" -> (EventAnalytics.hourlyTypeCounts _),
    "json_props_agg" -> (EventAnalytics.jsonPropsAgg _),
    "user_activity" -> (EventAnalytics.userActivity _),
    "user_sessions" -> (EventAnalytics.userSessions _),
    // ordered view→click→purchase funnel: sequential conditional minima,
    // everything keyed on user_id (co-partitioned end to end)
    "conversion_funnel" -> (EventAnalytics.conversionFunnel _),
    // first-order Markov transitions: per-user lead() (one shuffle on
    // user_id), type²-sized rollup, row-normalized probabilities
    "event_transitions" -> (EventAnalytics.eventTransitions _),
    // top-k ordered session paths: sessionize (one shuffle on user_id),
    // per-session ordered type join, TakeOrdered rollup
    "session_paths" -> ((s, d) => EventAnalytics.sessionPaths(s, d)),
    // weekly cohort retention: first-event cohort × active-week offset in
    // exact epoch arithmetic; result dashboard-sized by construction
    "cohort_retention" -> (EventAnalytics.cohortRetention _),
    "value_quantiles" -> (EventAnalytics.valueQuantiles _),
    "value_quantiles_approx" -> ((s, d) => EventAnalytics.valueQuantilesApprox(s, d)), // rows-only (sketch)
    "value_quantiles_envelope" -> ((s, d) => EventAnalytics.valueQuantilesEnvelope(s, d)), // hash-checked sketch error bound
    // per-type 3-sigma outliers in EXACT integer-cents arithmetic
    // ((n·c−S)² > k²(nQ−S²), decimal128) — no float boundary flips; the
    // 5-row moment table broadcast, events never shuffle
    "value_outliers" -> ((s, d) => EventAnalytics.valueOutliers(s, d)),
    // one-scan per-column data-quality profile (nulls/distinct/min/max),
    // stacked to long form
    "documents_profile" -> (Profile.documentsProfile _),
    // embedding-table audit gate: dims, zero/NaN vectors, norm mass —
    // double-cast squares, 6-dp norms, integer-micros aggregate
    "embedding_profile" -> (Profile.embeddingProfile _),
    // per-source curation decision table: volume, exact-dup and
    // contamination counts, quality mass in exact integer units
    "source_curation_report" -> (Profile.sourceCurationReport _),
    // release-to-release snapshot diff: one co-partitioned full-outer join
    // classifying added/removed/changed/unchanged by content hash
    "corpus_diff" -> (Profile.documentsDiff _),
    // distribution-shift alarm: top terms by smoothed KL contribution
    // between the ingest batch and the standing corpus (integer-micro ln)
    "vocab_drift" -> ((s, d) => Profile.vocabDrift(s, d)),
    // lexical-rarity quality signal: mean corpus frequency of each doc's
    // tokens — BIGINT sums + ONE final division (engine-order-exact)
    "token_rarity" -> ((s, d) => TextAnalysis.tokenRarityScore(s, d)),
    // DSIR importance weighting toward the French target slice: log-ratio
    // feature table dumped in integer micros (the transcendental step lives
    // in the dump), per-doc weights are exact BIGINT dot products
    "dsir_token_ratios" -> ((s, d) => Dsir.tokenRatios(s, d)), // rows-only (it IS the oracle input)
    "dsir_doc_weights" -> ((s, d) => Dsir.docWeights(s, d)),
    "dsir_top_weighted" -> ((s, d) => Dsir.topWeighted(s, d)),
    // CCNet-style LM quality scoring: add-one bigram model trained on the
    // English reference slice, model tables dumped in integer micros, every
    // doc's NLL an exact BIGINT sum + one final division
    "lm_bigram_logprobs" -> (NgramLm.bigramLogprobs _), // rows-only (it IS the oracle input)
    "lm_unigram_defaults" -> (NgramLm.unigramDefaults _), // rows-only (it IS the oracle input)
    "lm_perplexity_scores" -> (NgramLm.perplexityScores _),
    "last_purchase_asof" -> (AsOf.lastPurchaseAsOf _),
    "event_session_attribution" -> (RangeJoin.eventSessionAttribution _),
    "purchase_click_attribution" -> (RangeJoin.purchaseClickAttribution _),
    // —— ML stage (rows-only: K-Means is not DuckDB-expressible) ——
    "kmeans_assignments" -> (TextClustering.assignmentsEntry _), // rows-only (it IS the oracle input)
    "kmeans_cluster_sizes" -> (TextClustering.clusterSizes _),
    // distilled quality classifier: heuristic weak labels → seeded logistic
    // regression; coefs dumped, scoring replayed literal-for-literal
    "quality_model_coefs" -> (graft.ml.QualityClassifier.coefsEntry _), // rows-only (it IS the oracle input)
    "quality_classifier_scores" -> (graft.ml.QualityClassifier.scoresEntry _),
    "quality_classifier_eval" -> (graft.ml.QualityClassifier.evalEntry _),
    // —— LLM-pipeline: dedup family ——
    "exact_dedup" -> (Dedup.exactDedup _),
    // normalization-tolerant exact tier (C4 "fuzzy exact"): case-fold +
    // punctuation/whitespace collapse BEFORE the hash group-by; n_variants
    // audits how many raw forms each normalized group collapsed
    "normalized_dedup" -> (Dedup.normalizedDedup _),
    // edit-distance tier: banded-LSH candidates (dumped below — they ARE
    // the oracle input) verified with BOUNDED Levenshtein; the −1 reject of
    // the bound is exactly the integer threshold criterion, no float gate
    "edit_candidates" -> ((s, d) => Dedup.editCandidates(s, d)), // rows-only (it IS the oracle input)
    "edit_near_dup" -> ((s, d) => Dedup.editNearDup(s, d)),
    // cross-tier agreement matrix: MinHash/edit/SimHash pair sets rolled
    // up by presence combination — the two LSH-verified tiers share ONE
    // lineage-cut candidate pass; full-outer joins are pair-graph-sized
    "dedup_tier_overlap" -> ((s, d) => Dedup.dedupTierOverlap(s, d)),
    // keep-BEST policy over near-dup families: highest quality_score wins
    // (ties to smaller doc_id); min_doc_id audits divergence vs keep-first
    "quality_keep_dedup" -> ((s, d) => Dedup.qualityKeepDedup(s, d)),
    // the shippable form: exact keepers minus non-keeper family members —
    // both subtractions pair-graph-sized anti-join probes
    "quality_keep_corpus" -> ((s, d) => Dedup.qualityKeepCorpus(s, d)),
    "near_dup_pairs" -> ((s, d) => Dedup.nearDupPairs(s, d)),
    // mirror detection: the near-dup pair set rolled up by unordered
    // source pair; jaccard summed in exact ten-thousandths
    "cross_source_dup_matrix" -> ((s, d) => Dedup.crossSourceDupMatrix(s, d)),
    // EXACT token-n-gram Jaccard join via prefix filtering (AllPairs/PPJoin
    // family): deterministic counterpart of the MinHash tier — candidates
    // from each doc's globally-RAREST grams only, size filter in the join
    "token_jaccard_pairs" -> ((s, d) => Dedup.tokenJaccardPairs(s, d)),
    // batch-vs-standing-corpus LSH (the daily-ingestion path: batch bands
    // join a pre-capped corpus band index; corpus×corpus never pairs)
    "incremental_near_dup" -> ((s, d) => Dedup.incrementalNearDup(s, d)),
    // exact incremental dedup behind a Bloom pre-filter: the corpus travels
    // as one fixed-size broadcast sketch, candidates broadcast back for the
    // exact verify — neither side shuffles, result bit-equal to the plain
    // anti-join (no false negatives; false positives only re-verify)
    "bloom_incremental_dedup" -> ((s, d) => Dedup.bloomIncrementalDedup(s, d)),
    // same semantics against a PERSISTED bucketed band index (build absorbed
    // by warmup; probes read the corpus side co-located, zero exchange —
    // BucketingSpec pins the plan shape)
    "incremental_near_dup_indexed" -> (Dedup.incrementalNearDupIndexedEntry _),
    // the band-index DELETE lifecycle: junk appended, tombstoned
    // (deleteFromIndexTable), absorbed by compactIndexTable's rewrite —
    // append∘delete∘absorb is the identity, so the probe shares the
    // incremental oracle; the probe corpus includes the junk texts so a
    // missed retraction fails the hash instead of hiding in the verify
    "incremental_near_dup_deleted" -> (Dedup.incrementalNearDupDeletedEntry _),
    // TIERED probe against the persisted indexes: exact-hash tier first
    // (co-located equi-join, byte-equality verified, jaccard 1.0), the
    // 128-band near-dup tier only over the batch docs with no exact twin —
    // the firehose ingest shape where exact re-fetches skip the band explode
    "tiered_incremental_dedup" -> (Dedup.tieredIncrementalDedupEntry _),
    // benchmark decontamination: corpus docs sharing token 8-grams with a
    // held-out slice; benchmark grams broadcast, corpus never shuffled
    "ngram_contamination" -> ((s, d) => Decontamination.ngramContamination(s, d)),
    // release-report audit: 8-gram overlap between the md5 train and test
    // holdout bands (test grams broadcast, train never shuffles)
    "split_leakage" -> ((s, d) => Decontamination.splitLeakage(s, d)),
    // semantic tier of the benchmark sweep: corpus vecs whose cosine against
    // any broadcast benchmark vec reaches the threshold (paraphrase-shaped
    // contamination an n-gram check cannot see)
    "semantic_contamination" -> ((s, d) => Decontamination.semanticContamination(s, d)),
    // connected components over the pair graph (dup FAMILIES); oracle is a
    // DuckDB recursive CTE over the same brute-force pair set
    "near_dup_clusters" -> ((s, d) => Dedup.nearDupClusters(s, d)),
    // oracle: DuckDB brute-forces Hamming pairs over the Spark-dumped
    // signatures below ({OUT} placeholder) — the xxhash64-based hash itself
    // has no DuckDB twin, the pair derivation does
    "simhash_near_dup" -> ((s, d) => Dedup.simhashNearDup(s, d)),
    "simhash_signatures" -> ((s, d) => Dedup.simhashSignatures(s, d)), // rows-only (it IS the oracle input)
    "embedding_near_dup" -> ((s, d) => Dedup.embeddingNearDup(s, d)),
    // semantic dup FAMILIES: the same label propagation as
    // near_dup_clusters over the cosine pair graph
    "embedding_dup_clusters" -> (Dedup.embeddingDupClusters _),
    // SemDeDup: cluster-scoped semantic pruning over the standing k-means
    // cells (pair space bounded by sum |cell|^2, not n^2); keep-lowest-id
    // per dup group, audit-shaped 0/1 output; oracle replays the in-cell
    // pair scan from the ivf_assignments dump
    "semdedup_pruned" -> ((s, d) => Dedup.semdedupPruned(s, d)),
    // prototype pruning (SSL-prototypes): cosine-to-own-centroid score,
    // per-cell rank, drop the most prototypical quarter (integer quota);
    // centroids dumped (proto_centroids) so DuckDB replays score+rank+quota
    "prototype_pruned" -> ((s, d) => Dedup.prototypePruned(s, d)),
    "proto_centroids" -> ((s, d) => Dedup.protoCentroids(s, d)), // rows-only (it IS the oracle input)
    // index-health audit: per-cell balance + mean cosine-to-own-centroid
    // in exact integer micros (sum DIV n) — the re-train-the-quantizer
    // signal; replayed from the same assignment/centroid dumps
    "ivf_quantization_error" -> ((s, d) => Dedup.ivfQuantizationError(s, d)),
    // D4 = SemDeDup then prototype-prune the survivors (quotas on survivor
    // cell sizes); both stage decisions in the audit output
    "d4_pruned" -> ((s, d) => Dedup.d4Pruned(s, d)),
    // cluster-balanced diversity sampling: cap every coarse cell at
    // perCell members by md5 order (unbiased, membership-pure); salted
    // two-phase rank so a giant cluster never funnels one window task
    "cluster_balanced_sample" -> ((s, d) => Dedup.clusterBalancedSample(s, d)),
    // IVF retrain-on-drift (the ops response to ivf_quantization_error):
    // planted-drift fixture (even half fit, reversed odd half appended to
    // frozen centers), then refit + staged atomic swap; the health table
    // pre/post is fully replayed by DuckDB from the two dumps below
    "ivf_retrain_health" -> ((s, d) => Similarity.ivfRetrainHealth(s, d)),
    // the drift-ALARM decision the auto-retrain loop fires on: per-phase
    // corpus-weighted health rollup + strict-below-floor comparison, the
    // floor being the refit geometry's own mean (scale-stable)
    "ivf_drift_alarm" -> ((s, d) => Similarity.ivfDriftAlarm(s, d)),
    "ivf_retrain_assignments" -> ((s, d) => Similarity.ivfRetrainAssignments(s, d)), // rows-only (it IS the oracle input)
    "ivf_retrain_centroids" -> ((s, d) => Similarity.ivfRetrainCentroids(s, d)), // rows-only (it IS the oracle input)
    // semantic dedup's daily-ingestion path: batch sign-LSH bands probe a
    // PERSISTED bucketed embedding band index (build absorbed by warmup;
    // index side co-located, candidate-bounded exact-cosine verify)
    "incremental_embedding_near_dup" ->
      (Dedup.incrementalEmbeddingNearDupEntry _),
    // rows-only: production LSH geometry (threshold .95, r=8/b=32) reported
    // as volume stats — the near-exhaustive test geometry above is what the
    // brute-force oracle can check; this is what runs at 100 TB
    "embedding_near_dup_scale" -> ((s, d) => Dedup.embeddingNearDupScale(s, d)),
    // —— LLM-pipeline: similarity search ——
    "cosine_topk" -> ((s, d) => Similarity.cosineTopK(s, d)),
    // matryoshka truncation eval: recall@10 of prefix-truncated rankings
    // (d = 8/16/32 of 64) vs the full-dim exact top-k — the
    // dimension-selection table; every dim reuses the cosine_topk topology
    "matryoshka_recall" -> ((s, d) => Similarity.matryoshkaRecall(s, d)),
    // retrieval-quality eval: label precision@10 over the exact top-k —
    // ranking, label joins, and arithmetic all replayed by the oracle
    "retrieval_label_precision" -> ((s, d) => Similarity.retrievalLabelPrecision(s, d)),
    // contrastive-training hard negatives: top-k cosine among OTHER-label
    // vectors, label inequality pruning inside the broadcast join
    "hard_negatives" -> ((s, d) => Similarity.hardNegatives(s, d)),
    // lexical retrieval tier: Okapi BM25 with the tf part exact-rational
    // (22·tf·L / (10·tf·L + 3·L + 9·dl·N)) and ln() quantized per TERM —
    // per-doc scores are exact BIGINT sums
    "bm25_topk" -> ((s, d) => graft.operators.Bm25.bm25TopK(s, d)),
    // the AMORTIZED standing lexical-index probe: term-bucket-partitioned
    // postings with denormalized doc lengths + per-segment stats rows
    // folded at probe (build absorbed by warmup). Same oracle as
    // bm25_topk — the segment layout, bucket-pruned scan, and
    // pruned-slice df count are execution choices, not semantics
    "bm25_topk_indexed" -> ((s, d) => graft.operators.Bm25.bm25TopKIndexed(s, d)),
    // a probe THROUGH a COMPACTED lexical index: three segments'
    // term-bucket files rewritten to one sized file per bucket and
    // swapped in place (stats rows untouched — they still fold to the
    // batch constants). Same oracle as bm25_topk; the entry guards the
    // file-count reduction in-line
    "bm25_topk_compacted" -> ((s, d) => graft.operators.Bm25.bm25TopKCompacted(s, d)),
    // the lexical DELETE lifecycle: junk appended, tombstoned (probe-time
    // anti-join + (N, Σdl) correction), physically absorbed by the
    // compaction row transform — append∘delete∘absorb is the identity, so
    // this shares bm25_topk's oracle and the retraction path is replayed
    "bm25_topk_deleted" -> ((s, d) => graft.operators.Bm25.bm25TopKDeleted(s, d)),
    // reciprocal-rank fusion of the lexical and semantic rankings —
    // contributions micro-quantized, sums exact; fusion is queries×k-sized
    "hybrid_rrf_topk" -> ((s, d) => graft.operators.Bm25.hybridRrfTopK(s, d)),
    // retrieval returning documents (the RAG fetch shape): ranking side
    // broadcasts, the corpus never shuffles
    "semantic_search_docs" -> ((s, d) => Similarity.semanticSearchDocs(s, d)),
    // IVF: assignments + probed cells dumped (they ARE the oracle inputs),
    // the ranking oracle-checked — DuckDB replays the pruned scan + exact
    // rescoring from the dumps, so the approximation is captured in the
    // dumps and the scan/score/rank arithmetic is hash-verified
    "ivf_assignments" -> ((s, d) => Similarity.ivfAssignmentsEntry(s, d)), // rows-only (it IS the oracle input)
    "ivf_probe_cells" -> ((s, d) => Similarity.ivfProbeCellsEntry(s, d)), // rows-only (it IS the oracle input)
    "ivf_topk" -> ((s, d) => Similarity.ivfTopK(s, d)),
    // build-once/query-many path: persist the standing fit partitioned by
    // cell, re-load, probe with partition pruning (PlanShapeSpec pins the
    // pruning). Hash-checked since r10 — same dump replay as ivf_topk; the
    // timed cost is the on-disk construction (write+reload) + pruned probe
    "ivf_topk_persisted" -> ((s, d) => Similarity.ivfTopKPersisted(s, d)),
    // the vector DELETE lifecycle: drifted junk appended, tombstoned
    // (probe-time anti-join), physically absorbed (compaction transform +
    // carry-free tombstone retirement) — append∘delete∘absorb is the
    // identity, so this replays from the same dumps as ivf_topk
    "ivf_topk_deleted" -> ((s, d) => Similarity.ivfTopKDeleted(s, d)),
    // the SECOND-LEVEL coarse quantizer (FAISS IMI shape): probe cells
    // chosen by ranking ncoarse super-centroids, opening the top wCoarse,
    // ranking only their member centroids — the nlist~10^6 probe path;
    // rows-only dump (the oracle input) + the hash-checked probe over it
    "ivf_coarse_probe_cells" -> ((s, d) => Similarity.ivfCoarseProbeCellsEntry(s, d)),
    "ivf_topk_coarse" -> ((s, d) => Similarity.ivfTopKCoarse(s, d)),
    // ANN tuning curve: recall@10 vs nprobe against the exact ranking,
    // every width replayed from the ranked probe-cells dump
    "ivf_recall_curve" -> ((s, d) => Similarity.ivfRecallCurve(s, d)),
    // AMORTIZED standing-index probe — build absorbed by the bench's
    // untimed warmup; timed passes pay load + pruned probe only. Same
    // oracle as ivf_topk: the persisted layout is the standing index's fit
    "ivf_probe_only" -> ((s, d) => Similarity.ivfProbeOnly(s, d)),
    // the standing probe through the SQL TABLE-VALUED surface
    // (graft_ivf_topk TVF -> the queryStandingIvf plan, identical by
    // construction); shares ivf_topk's oracle = hash-checked plan identity
    "ivf_topk_sql" -> ((s, d) => Similarity.ivfTopKSql(s, d)),
    // product quantization: codes + per-query ADC tables dumped (they ARE
    // the oracle inputs), the ranking oracle-checked — DuckDB recomputes
    // the ADC top-k from the dumps alone
    "pq_codes" -> (Pq.pqCodesEntry _), // rows-only (it IS the oracle input)
    "pq_query_dtabs" -> ((s, d) => Pq.pqQueryDtabs(s, d)), // rows-only (it IS the oracle input)
    "pq_adc_topk" -> ((s, d) => Pq.pqAdcTopK(s, d)),
    // PQ shortlist + exact rerank — the production retrieval shape; both
    // stages replayed by the oracle (shortlist from the dumps, rerank from
    // the raw embeddings table)
    "pq_rerank_topk" -> ((s, d) => Pq.pqRerankTopK(s, d)),
    // the AMORTIZED standing-index probe: persisted codes + frozen
    // codebooks (build absorbed by warmup); same oracle as pq_adc_topk —
    // the index is an execution layout, not a semantic
    "pq_adc_topk_indexed" -> ((s, d) => Pq.pqAdcTopKIndexed(s, d)),
    "pq_codebooks" -> ((s, d) => Pq.pqCodebooksEntry(s, d)), // rows-only (it IS the oracle input)
    // the compressed tier's index-health watch signal: per-subspace
    // reconstruction error vs the assigned codeword, exact integer micros —
    // the retrain trigger of the PQ ops loop
    "pq_quant_error" -> ((s, d) => Pq.pqQuantError(s, d)),
    // IVF cells × PQ codes — the billion-scale ANN composition: prune
    // cells, scan 8-byte codes. Oracle-checked: built on the STANDING
    // coarse index, so the ivf_* + pq_* dumps replay the whole
    // composition (+ spec:PqSpec recall floor)
    "ivf_pq_topk" -> ((s, d) => Pq.ivfPqTopK(s, d)),
    // residual-encoded IVF×PQ (the FAISS IVFADC layout): codes quantize
    // x − center(cell), the query side uses per-(query, probed-cell)
    // tables over q − center(cell). Same composition dumps (assignments +
    // probe cells) plus the two residual dumps replay it end to end
    "pq_residual_codes" -> (Pq.pqResidualCodesEntry _), // rows-only (it IS the oracle input)
    "pq_residual_dtabs" -> ((s, d) => Pq.pqResidualDtabs(s, d)), // rows-only (it IS the oracle input)
    "pq_residual_codebooks" -> (Pq.pqResidualCodebooksEntry _), // rows-only (it IS the oracle input)
    "ivf_centers" -> ((s, d) => Similarity.ivfCentersEntry(s, d)), // rows-only (it IS the oracle input)
    "ivf_pq_residual_topk" -> ((s, d) => Pq.ivfPqResidualTopK(s, d)),
    // the AMORTIZED persisted-layout probe of the residual composition:
    // centers + residual codebooks loaded from the artifact, the
    // cell-partitioned residual codes pruned at file listing. Same
    // oracle as ivf_pq_residual_topk — the layout is an execution choice
    "ivf_pq_residual_topk_indexed" -> ((s, d) => Pq.ivfPqResidualTopKIndexed(s, d)),
    // the residual tier's index-health signal AND its quantitative
    // justification: same 8-byte code budget as pq_quant_error, strictly
    // lower distortion (spec:PqSpec pins the dominance). Replayed from
    // the residual codes/codebooks + centers/assignments dumps: slice →
    // subtract center → L2 to assigned codeword → integer micros rollup
    "pq_residual_quant_error" -> ((s, d) => Pq.pqResidualQuantError(s, d)),
    // the residual tier's justification table: recall@10 of the raw-code
    // and residual-code compositions against the exact squared-L2
    // ranking — all three legs deterministic, the whole rollup replayed
    // (raw from the four ivf_pq dumps, residual from the two residual
    // dumps, exact from the embeddings table)
    "pq_residual_recall" -> ((s, d) => Pq.pqResidualRecall(s, d)),
    // the AMORTIZED composed-index probe: the PERSISTED cell-partitioned
    // codes layout served through the cell-aware fold (build absorbed by
    // warmup); same oracle as ivf_pq_topk — layout + fold are execution
    // choices, not semantics, so the serving fold itself is hash-checked
    "ivf_pq_topk_indexed" -> ((s, d) => Pq.ivfPqTopKIndexed(s, d)),
    // a probe THROUGH a COMPACTED composed index: the layout fragmented by
    // three frozen-geometry appends, then rewritten to one sized file per
    // cell + staged-swapped (graft.util.Compaction) — same rows as the
    // one-shot build, so compaction itself is DuckDB-replay-checked
    "ivf_pq_topk_compacted" -> ((s, d) => Pq.ivfPqTopKCompacted(s, d)),
    // a COMPOSED index probed THROUGH the persisted two-level coarse
    // choice — the serving default at production nlist, pinned at the
    // geometry the ivf_coarse_probe_cells dump replays (nlist=16,
    // ncoarse=4, wCoarse=2); own oracle: the coarse dump is the probe set
    "ivf_pq_topk_coarse" -> ((s, d) => Pq.ivfPqTopKCoarse(s, d)),
    // SQ8 scalar quantization — the 4x compression tier below PQ: per-dim
    // 8-bit grid, compressed-domain ranking in EXACT integer L2 (no
    // per-query table, no float pin), exact rerank of the shortlist
    "sq_params" -> (Sq.sqParamsEntry _), // rows-only (audit surface)
    "sq_codes" -> (Sq.sqCodesEntry _), // rows-only (it IS the oracle input)
    "sq_adc_topk" -> ((s, d) => Sq.sqAdcTopK(s, d)),
    // the AMORTIZED standing-index probe: persisted codes + frozen grid
    // (build absorbed by warmup); same oracle as sq_adc_topk — the index
    // is an execution layout, not a semantic (the pq_adc_topk_indexed
    // pattern, closing the SQ8 tier's standing-index gap)
    "sq_adc_topk_indexed" -> ((s, d) => Sq.sqAdcTopKIndexed(s, d)),
    "sq_rerank_topk" -> ((s, d) => Sq.sqRerankTopK(s, d)),
    // per-dim grid reconstruction error — pq_quant_error's shape for the
    // 4x tier, replayed from the sq_codes + sq_params dumps against the
    // raw embeddings; the SQ ops loop's drift signal (its per-batch fold
    // shares this entry's reconErr arithmetic, so alarm evidence is
    // oracle-replayed by construction)
    "sq_quant_error" -> (Sq.sqQuantError _),
    // —— LLM-pipeline: text analysis ——
    "text_stats" -> (TextAnalysis.textStats _),
    "lang_id" -> (TextAnalysis.langId _),
    "doc_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(s, d)),
    "lang_profile" -> (TextAnalysis.langProfile _),
    "lang_source_rollup" -> (TextAnalysis.langSourceRollup _),
    // langid eval: heuristic prediction vs the labeled lang column, one
    // scan (guess computed with the label in hand — no self-join), r6
    // within-label share
    "lang_confusion" -> (TextAnalysis.langConfusion _),
    // tokenizer-budget diagnostic: BPE-ish tokens per whitespace word per
    // language — exact integer sums, one final division r6
    "tokenizer_fertility" -> (TextAnalysis.tokenizerFertility _),
    // Gopher/C4 repetition-quality signals, one shuffle-free fused
    // expression per row; oracle re-derives them via explode + group-by
    "repetition_stats" -> ((s, d) => TextAnalysis.repetitionStats(s, d)),
    // corpus vocabulary: top-100 tokens by occurrence count with document
    // frequency — classic wordcount (partial-agg + one shuffle + TakeOrdered)
    "vocab_stats" -> ((s, d) => TextAnalysis.vocabStats(s, d)),
    // token 8-grams shared by >= 2 docs (exact-substring duplication
    // signal); grams from the native TokenNgramsExpr, one partial-agg shuffle
    "ngram_doc_freq" -> ((s, d) => TextAnalysis.ngramDocFreq(s, d)),
    // BPE tokenizer training's first step: frequency-weighted adjacent
    // char-pair counts (within-word multiplicity kept) — wordcount shape
    "bpe_pair_counts" -> ((s, d) => TextAnalysis.bpePairCounts(s, d)),
    // full BPE tokenizer: driver-side learn over the bounded word-count
    // table, broadcast-rank apply; the iterative learn is a dump, the
    // usage rollup over it is the oracle-checked derivation
    "bpe_merges" -> (Bpe.mergesEntry _), // HASH-CHECKED since r12 (recursive learn-loop replay)
    // apply is HASH-CHECKED (upgraded from a dump): greedy lowest-rank
    // merging over the STATIC rank table is a deterministic single-path
    // walk, so DuckDB replays it recursively from the bpe_merges dump
    "bpe_tokenized" -> (Bpe.tokenizedEntry _),
    "bpe_vocab_usage" -> (Bpe.vocabUsageEntry _),
    // WordPiece tokenizer (the BERT-family segmenter): likelihood-scored
    // driver learn over the same bounded word table, greedy
    // longest-match-first apply. Stronger oracle than BPE's: the APPLY is
    // hash-checked — DuckDB replays the greedy walk with a recursive CTE
    // over the vocab dump and reassembles docs by word ordinal
    "wordpiece_vocab" -> (Wordpiece.vocabEntry _), // HASH-CHECKED since r12 (recursive learn-loop replay)
    "wordpiece_tokenized" -> (Wordpiece.tokenizedEntry _),
    "wordpiece_vocab_usage" -> (Wordpiece.vocabUsageEntry _),
    // Unigram-LM / SentencePiece (Kudo 2018) — the third subword family:
    // EM learn on the driver over the bounded word table (dump), Viterbi
    // apply with integer micro log-probs HASH-CHECKED: DuckDB carries the
    // dp vector as a list through a recursive CTE and rebuilds the argmax
    // path with the same smallest-split tie-break
    "unigram_vocab" -> (UnigramLm.vocabEntry _), // rows-only (it IS the oracle input)
    "unigram_tokenized" -> (UnigramLm.tokenizedEntry _),
    "unigram_vocab_usage" -> (UnigramLm.vocabUsageEntry _),
    // the triad side-by-side: total tokens, exact-integer fertility
    // (tokens-per-word micros), distinct pieces fired — one exploded
    // count/count-distinct per tokenizer, replayed from the three dumps
    "tokenizer_fertility_compare" ->
      ((s, d) => TokenizerAudit.fertilityCompare(s, d)),
    // exact-substring spans (Lee et al. 2022 relationally): positional
    // 8-grams occurring 2+ times corpus-wide, overlapping windows merged
    // gap-and-island; dup-gram set broadcast, corpus positions never
    // shuffle on the gram (count branch ships 8-byte partial aggs only)
    "dup_spans" -> ((s, d) => DupSpans.dupSpans(s, d)),
    // the corpus with those spans cut out: per-doc span lists joined back
    // once by doc_id, HOF trim per row, whitespace-normalized rebuild
    "span_trimmed_corpus" -> ((s, d) => DupSpans.spanTrimmedCorpus(s, d)),
    // Lee et al.'s minimum-match-length form: only merged spans of >= 50
    // tokens are trimmed; short incidental matches (quotes, idioms) stay.
    // Length filter runs on the span list, never the corpus
    "long_span_trimmed_corpus" -> ((s, d) => DupSpans.longSpanTrimmedCorpus(s, d)),
    // WHERE contamination lives (not just which docs): benchmark-overlap
    // spans, and the surgical alternative to dropping — trim the
    // overlapping run, keep the unique prose
    "contamination_spans" -> ((s, d) => DupSpans.contaminationSpans(s, d)),
    "contamination_trimmed_corpus" -> ((s, d) => DupSpans.contaminationTrimmedCorpus(s, d)),
    // C4's keep-FIRST global span dedup (discard all but one occurrence):
    // non-overlapping 8-token blocks, first owner by (doc_id, position),
    // duplicated-block set broadcast so corpus blocks never shuffle
    "block_dedup_corpus" -> (DupSpans.blockDedupCorpus _),
    // the sketch scale path of vocab_stats: mergeable SpaceSaving counters,
    // shuffle carries O(tasks x capacity) not O(distinct tokens); exact
    // (err 0) while tasks see <= capacity distinct items — the fixture's
    // regime (31 distinct << 256), so the exact oracle applies; the
    // eviction regime's error bounds are pinned in SamplingSpec instead
    "vocab_stats_sketch" -> ((s, d) => TextAnalysis.vocabStatsSketch(s, d)),
    // per-doc top-3 characteristic terms by tf/df (linear idf keeps the
    // oracle exact); vocabulary-sized df broadcast onto the tf side
    "tfidf_top_terms" -> ((s, d) => TextAnalysis.tfidfTopTerms(s, d)),
    // fixed 64-token training chunks per doc (ragged tail), shuffle-free
    "doc_chunks" -> ((s, d) => TextAnalysis.docChunks(s, d)),
    // concat-and-pack: chunks laid end-to-end per SHARD, cut into 256-token
    // packs by integer running-total arithmetic (shard-parallel windows,
    // no global funnel); per-pack fill audit
    "packed_sequences" -> ((s, d) => TextAnalysis.packedSequences(s, d)),
    // padded-batch counterpart of packing: bit-length buckets, per-(shard,
    // bucket) deterministic batches, exact-integer fill-ratio audit
    "length_bucketed_batches" ->
      ((s, d) => TextAnalysis.lengthBucketedBatches(s, d)),
    // corpus rollup of both strategies: padded vs real token mass — the
    // compute the bucketing saves, identical real mass by construction
    "padding_waste_report" ->
      ((s, d) => TextAnalysis.paddingWasteReport(s, d)),
    // per-shard fill/overflow audit of the packing layout (the number a
    // trainer needs to size truncation policy and spot wasted context)
    "packing_efficiency" -> ((s, d) => TextAnalysis.packingEfficiency(s, d)),
    // per-source quality z-scores from decimal-exact moments (one float
    // division at the end); the cross-source calibration gate
    "quality_calibration" -> ((s, d) => TextAnalysis.qualityCalibration(s, d)),
    // per-source trigram type-token ratio: template/boilerplate signal;
    // total grams derived WITHOUT an explode
    "source_ngram_diversity" -> ((s, d) => TextAnalysis.sourceNgramDiversity(s, d)),
    // PII sweep over deterministically-planted synthetic PII: per-doc
    // email/phone/IP counts + redacted text, identical regexes both engines
    "pii_redaction" -> (Pii.piiRedaction _),
    // quality score + repetition gates composed — the published recipes
    // layer exactly these two filter families
    "quality_gated_corpus" -> ((s, d) => Pipelines.qualityGatedCorpus(s, d)),
    // C4 line-level cleaning (fixture-calibrated rule config; the full
    // published config is spec-tested on crafted multi-line pages)
    "line_cleaned_corpus" -> (LineClean.lineCleanedCorpus _),
    "stratified_sample" -> (Sampling.stratifiedSample _),
    // Efraimidis-Spirakis A-ES weighted sampling without replacement:
    // token-weighted top-100, md5-derived uniforms, micro-quantized
    // ln(u)/w priority — corpus never shuffles (TakeOrdered)
    "weighted_sample" -> ((s, d) => Sampling.weightedSample(s, d)),
    // per-source quality cap: each source's top-`cap` docs by quality score
    // (doc_id tiebreak), salted two-phase rank — no per-source funnel
    "source_capped_corpus" -> ((s, d) => Sampling.sourceCappedCorpus(s, d)),
    // deterministic train/val/test bands over md5(doc_id): disjoint and
    // exhaustive by construction, docs never migrate as the corpus grows
    "corpus_splits" -> ((s, d) => Sampling.corpusSplits(s, d)),
    // reproducible multi-epoch data order: fixed shard membership,
    // per-epoch md5 reshuffle within each shard, per-shard row_number —
    // nothing global-sorts
    "training_order" -> ((s, d) => Sampling.trainingOrder(s, d)),
    // easy-to-hard curriculum: per-epoch quality-value cutoffs from the
    // bounded histogram (final epoch = whole corpus), training_order's
    // shard/reshuffle windows within each epoch slice
    "curriculum_order" -> ((s, d) => Sampling.curriculumOrder(s, d)),
    // the dataloader contract: curriculum order × token counts × the
    // packing rule — per (epoch, shard, pack) ordered doc spans, with
    // exactly-once-per-epoch conservation pinned in SamplingSpec
    "training_manifest" -> ((s, d) => Sampling.trainingManifest(s, d)),
    // per-shard audit of the 16-way md5-mod training-shard layout (the
    // write path is Sampling.writeTrainingShards; SamplingSpec pins both)
    "corpus_shards" -> ((s, d) => Sampling.corpusShards(s, d)),
    // corpus MIXING: per-language token budgets -> data-derived keep rates
    // -> deterministic md5 gate; totals, rates, and gate all re-derived by
    // the oracle
    "corpus_mixture" -> ((s, d) => Sampling.corpusMixture(s, d)),
    // temperature-scaled (p^alpha) per-language mixture weights — the
    // multilingual sampling table; doubles r6 after each engine's own pow
    "mixture_temperature" -> ((s, d) => Sampling.mixtureTemperature(s, d)),
    // mixing with UPSAMPLING: floor(budget/actual) full epochs per doc +
    // a fractional epoch gated at the remainder rate
    "corpus_mixture_epochs" -> ((s, d) => Sampling.corpusMixtureEpochs(s, d)),
    "sampled_users_per_type" -> ((s, d) => Sampling.sampledUsersPerType(s, d)),
    // —— LLM-pipeline: multimodal ——
    // oracle: DuckDB re-aggregates the Spark-dumped per-image features
    // below ({OUT} mechanism) — the seeded fake codec itself has no DuckDB
    // twin, the rollup over its output does
    "media_image_features" -> (graft.multimodal.Media.imageFeatureRollup _),
    "media_image_features_dump" -> (graft.multimodal.Media.imageFeatureDump _), // rows-only (it IS the oracle input)
    "media_audio_features" -> (graft.multimodal.Media.audioFeatureRollup _),
    "media_audio_features_dump" -> (graft.multimodal.Media.audioFeatureDump _), // rows-only (it IS the oracle input)
    "media_video_features" -> (graft.multimodal.Media.videoFeatureRollup _),
    "media_video_features_dump" -> (graft.multimodal.Media.videoFeatureDump _), // rows-only (it IS the oracle input)
    // perceptual image dedup: decode → integer aHash → multi-index Hamming
    // join (8×8-bit chunks, d ≤ 6) — SimHash-for-images, planted
    // re-encode variants that exact payload hashing cannot see
    "image_phash_dump" -> (graft.multimodal.Media.imagePhashDump _), // rows-only (it IS the oracle input)
    "image_phash_near_dup" -> (graft.multimodal.Media.imagePhashNearDup _),
    // audio leg: 64-band integer energy fingerprint (Haitsma–Kalker shape)
    // through the same multi-index Hamming core
    "audio_fp_dump" -> (graft.multimodal.Media.audioFpDump _), // rows-only (it IS the oracle input)
    "audio_fp_near_dup" -> (graft.multimodal.Media.audioFpNearDup _),
    // video leg: temporal hash — 8 frames × 8-bit luma-histogram signature
    "video_thash_dump" -> (graft.multimodal.Media.videoTHashDump _), // rows-only (it IS the oracle input)
    "video_thash_near_dup" -> (graft.multimodal.Media.videoTHashNearDup _),
    // LAION-style cross-modal pair dedup: a (image, caption) pair is a dup
    // iff the image is a perceptual near-dup AND the caption a text
    // near-dup — the conjunction joins the two edge relations on the
    // ordered pair key; quadrant resolution pinned in MediaSpec
    "crossmodal_pair_sigs" -> (graft.multimodal.Media.crossModalPairSigs _), // rows-only (it IS the oracle input)
    "crossmodal_dup_pairs" -> (graft.multimodal.Media.crossModalDupPairs(_, _)),
    // the image-firehose shape: arriving images probe a PERSISTED
    // (chunk,key)-bucketed signature index over the standing corpus —
    // zero index-side exchange, corpus×corpus never pairs
    "incremental_phash_near_dup" -> (graft.multimodal.Media.incrementalPhashNearDup _),
    // —— LLM-pipeline: composed corpus build (dedup ∧ quality ∧ lang) ——
    "clean_corpus" -> ((s, d) => Pipelines.cleanCorpus(s, d)),
    // the release shape: clean_corpus survivors carrying PII-scrubbed text
    // (select first, scrub last)
    "redacted_corpus" -> ((s, d) => Pipelines.redactedCorpus(s, d)),
    "near_dedup_corpus" -> ((s, d) => Pipelines.nearDedupCorpus(s, d)),
    // the full hygiene chain: exact+near dedup, restricted to trainable
    // (non-benchmark) docs, minus the decontamination sweep's hits
    "decontaminated_corpus" -> ((s, d) => Pipelines.decontaminatedCorpus(s, d)),
    // the Lee-et-al release chain with sub-document surgery: dedup → span
    // trim over the survivors → contamination sweep over the TRIMMED text
    "trimmed_release_corpus" -> ((s, d) => Pipelines.trimmedReleaseCorpus(s, d)),
    // the ingest-day chain: today's batch deduped within itself (exact +
    // near), against the STANDING corpus via the persisted band index, and
    // decontaminated against the benchmark slice
    "ingested_corpus" -> ((s, d) => Pipelines.ingestedCorpus(s, d)),
    // the per-doc RELEASE DECISION audit: every trainable doc with one
    // verdict in release-chain priority order (dup > contamination >
    // quality) — the reasoning behind what the composed chains drop
    "doc_curation_decisions" -> ((s, d) => Pipelines.curationDecisions(s, d)),
  )

  // Morton zval arithmetic, generated from ZOrder's own step table
  private val zvalSql = {
    val zx = graft.operators.ZOrder.spreadSql("l_partkey")
    val zy = graft.operators.ZOrder.spreadSql("l_suppkey")
    s"($zx | ($zy << 1))"
  }

  // oracle bodies shared between their own entry and the clean_corpus
  // composition (DuckDB allows WITH-queries inside a CTE subquery)
  private val exactDedupSql =
    "SELECT sha256(coalesce(text, '')) AS text_hash, min(doc_id) AS keep_doc_id, " +
      "count(*) AS n_dups FROM documents GROUP BY 1"
  private val textStatsSql =
    "WITH t AS (SELECT doc_id, coalesce(text,'') AS txt, " +
      "CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
      "ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks FROM documents), " +
      "m AS (SELECT doc_id, len(txt) AS len_chars, len(toks) AS n_tokens, " +
      "len(regexp_extract_all(txt, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens, " +
      "len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS n_stopwords, " +
      "len(txt) - len(regexp_replace(txt, '[[:punct:]]', '', 'g')) AS n_punct FROM t) " +
      // single exact-integer division + 1e-9 nudge per rounded column: same
      // bit-identical pre-round double as the Spark side, and half-way
      // decimals (where Spark's decimal-string rounding and DuckDB's
      // scale-then-round disagree) land consistently on round-up
      "SELECT doc_id, len_chars, n_tokens, n_bpe_tokens, n_stopwords, " +
      "round(n_punct::DOUBLE / greatest(len_chars, 1) + 1e-9, 4) AS punct_ratio, " +
      "round(n_stopwords::DOUBLE / greatest(n_tokens, 1) + 1e-9, 4) AS stopword_ratio, " +
      "round((least(len_chars, 500)::BIGINT * greatest(n_tokens, 1) * greatest(len_chars, 1) " +
      "+ 300 * n_stopwords * greatest(len_chars, 1) " +
      "+ 200 * (greatest(len_chars, 1) - n_punct) * greatest(n_tokens, 1))::DOUBLE " +
      "/ (1000::BIGINT * greatest(n_tokens, 1) * greatest(len_chars, 1)) + 1e-9, 4) AS quality_score FROM m"
  // shared by its own entry and the decontaminated_corpus composition
  private val ngramContaminationSql =
    "WITH tok AS (SELECT doc_id, CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
      "ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks FROM documents), " +
      "g AS (SELECT doc_id, CASE WHEN len(toks) < 8 THEN [] " +
      "ELSE list_distinct(list_transform(generate_series(1, len(toks)-7), " +
      "i -> array_to_string(toks[i:i+7], ' '))) END AS grams FROM tok), " +
      "b AS (SELECT doc_id AS bench_id, unnest(grams) AS gram FROM g WHERE doc_id % 10 = 0), " +
      "c AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 10 <> 0) " +
      "SELECT c.doc_id, b.bench_id, count(*) AS n_shared " +
      "FROM c JOIN b ON c.gram = b.gram GROUP BY 1, 2"
  // shared by the in-plan and persisted-index incremental entries: the index
  // changes execution layout, not semantics, so one brute-force twin serves both
  private val incrementalNearDupSql =
    "WITH sh AS (SELECT doc_id, list_distinct(list_transform(" +
      "generate_series(1, greatest(len(coalesce(text,''))-4, 0)), i -> coalesce(text,'')[i:i+4])) AS s " +
      "FROM documents) " +
      "SELECT new_doc_id, dup_of_doc_id, jaccard FROM (" +
      "SELECT a.doc_id AS dup_of_doc_id, b.doc_id AS new_doc_id, " +
      "round(len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard " +
      "FROM sh a JOIN sh b ON a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0 " +
      "WHERE len(a.s) > 0 AND len(b.s) > 0) " +
      "WHERE jaccard >= 0.8"
  private val nearDupPairsSql =
    "WITH sh AS (SELECT doc_id, list_distinct(list_transform(" +
      "generate_series(1, greatest(len(coalesce(text,''))-4, 0)), i -> coalesce(text,'')[i:i+4])) AS s " +
      "FROM documents) " +
      "SELECT a_doc_id, b_doc_id, jaccard FROM (" +
      "SELECT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id, " +
      "round(len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard " +
      "FROM sh a JOIN sh b ON a.doc_id < b.doc_id WHERE len(a.s) > 0 AND len(b.s) > 0) " +
      "WHERE jaccard >= 0.8"
  // the ingest-day composition: batch = doc_id % 10 = 1, benchmark = % 10
  // = 0, standing corpus = the rest. Same brute-force shingle/gram CTEs as
  // the component twins, with the pair spaces restricted to batch×batch
  // (ndb) and standing×batch (nds); the persisted band index on the Spark
  // side is an execution layout, not a semantic, so one SQL serves it.
  private val ingestedCorpusSql =
    "WITH sh AS (SELECT doc_id, list_distinct(list_transform(" +
      "generate_series(1, greatest(len(coalesce(text,''))-4, 0)), i -> coalesce(text,'')[i:i+4])) AS s " +
      "FROM documents), " +
      "kb AS (SELECT sha256(coalesce(text, '')) AS text_hash, min(doc_id) AS keep_doc_id " +
      "FROM documents WHERE doc_id % 10 = 1 GROUP BY 1), " +
      "ndb AS (SELECT a_doc_id, b_doc_id, jaccard FROM (" +
      "SELECT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id, " +
      "round(len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard " +
      "FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND a.doc_id % 10 = 1 AND b.doc_id % 10 = 1 " +
      "WHERE len(a.s) > 0 AND len(b.s) > 0) WHERE jaccard >= 0.8), " +
      "nds AS (SELECT new_doc_id, dup_of_doc_id, jaccard FROM (" +
      "SELECT a.doc_id AS dup_of_doc_id, b.doc_id AS new_doc_id, " +
      "round(len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard " +
      "FROM sh a JOIN sh b ON a.doc_id % 10 NOT IN (0, 1) AND b.doc_id % 10 = 1 " +
      "WHERE len(a.s) > 0 AND len(b.s) > 0) WHERE jaccard >= 0.8), " +
      "tok AS (SELECT doc_id, CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
      "ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks FROM documents), " +
      "g AS (SELECT doc_id, CASE WHEN len(toks) < 8 THEN [] " +
      "ELSE list_distinct(list_transform(generate_series(1, len(toks)-7), " +
      "i -> array_to_string(toks[i:i+7], ' '))) END AS grams FROM tok), " +
      "bg AS (SELECT doc_id AS bench_id, unnest(grams) AS gram FROM g WHERE doc_id % 10 = 0), " +
      "cg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 10 = 1), " +
      "ctb AS (SELECT cg.doc_id, bg.bench_id, count(*) AS n_shared " +
      "FROM cg JOIN bg ON cg.gram = bg.gram GROUP BY 1, 2) " +
      "SELECT d.doc_id, d.lang, d.n_chars FROM documents d " +
      "JOIN kb ON d.doc_id = kb.keep_doc_id " +
      "WHERE d.doc_id NOT IN (SELECT b_doc_id FROM ndb) " +
      "AND d.doc_id NOT IN (SELECT new_doc_id FROM nds) " +
      "AND d.doc_id NOT IN (SELECT doc_id FROM ctb)"

  // explode + group-by twin of the fused per-row repetition signals: line
  // and bigram multiplicities re-derived relationally, every fraction one
  // exact-integer division (+1e-9 nudge, 4-dp round). Shared by its own
  // entry and the quality_gated_corpus composition.
  private val repetitionStatsSql =
    "WITH l AS (SELECT doc_id, unnest(string_split(coalesce(text,''), chr(10))) AS line FROM documents), " +
      "lc AS (SELECT doc_id, line, count(*) AS c FROM l GROUP BY 1, 2), " +
      "ls AS (SELECT doc_id, sum(c) AS n_lines, count(*) AS n_distinct, " +
      "sum(len(line)*c) AS n_chars, sum(len(line)*(c-1)) AS dup_chars FROM lc GROUP BY 1), " +
      "tok AS (SELECT doc_id, CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
      "ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks FROM documents), " +
      "bg AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN [] " +
      "ELSE list_transform(generate_series(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1]) END) AS gram FROM tok), " +
      "bgc AS (SELECT doc_id, gram, count(*) AS c FROM bg GROUP BY 1, 2), " +
      "bgs AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_grams FROM bgc GROUP BY 1) " +
      "SELECT d.doc_id, " +
      "round((ls.n_lines - ls.n_distinct)::DOUBLE / greatest(ls.n_lines, 1) + 1e-9, 4) AS dup_line_frac, " +
      "round(ls.dup_chars::DOUBLE / greatest(ls.n_chars, 1) + 1e-9, 4) AS dup_line_char_frac, " +
      "round(coalesce(bgs.top_c, 0)::DOUBLE / greatest(coalesce(bgs.n_grams, 0), 1) + 1e-9, 4) AS top_bigram_frac " +
      "FROM documents d JOIN ls ON d.doc_id = ls.doc_id " +
      "LEFT JOIN bgs ON d.doc_id = bgs.doc_id"

  // prototype-score replay: assignments + float-cast centroid dumps →
  // cosine-to-own-centroid, per-cell rank (rounded desc, vec_id tiebreak)
  // and cell size — the scored frame behind prototype_pruned
  private val protoScoredCtes =
    "a AS (SELECT vec_id, cell FROM read_parquet('{OUT}/ivf_assignments/*.parquet')), " +
      "c AS (SELECT cell, list_transform(string_split(centroid, ','), x -> CAST(x AS DOUBLE)) AS centroid " +
      "FROM read_parquet('{OUT}/proto_centroids/*.parquet')), " +
      "e AS (SELECT a.vec_id, a.cell, " +
      "round(list_cosine_similarity(emb.embedding::DOUBLE[], c.centroid), 6) AS proto_cos " +
      "FROM a JOIN embeddings emb USING (vec_id) JOIN c USING (cell)), " +
      "r AS (SELECT vec_id, cell, proto_cos, " +
      "row_number() OVER (PARTITION BY cell ORDER BY proto_cos DESC, vec_id) AS rnk, " +
      "count(*) OVER (PARTITION BY cell) AS cell_n FROM e)"

  // shared by pq_adc_topk and pq_rerank_topk: per-(corpus vector, query)
  // ADC distance from the Spark-dumped codes + distance tables
  // IVF pruned-scan replay from the ivf_assignments + ivf_probe_cells
  // dumps; shared by ivf_topk and ivf_probe_only (same standing fit)
  // the IVF probe replay, parameterized over WHICH ranked probe-cells dump
  // chose the cells: the flat exact scan (`ivf_probe_cells`) and the
  // two-level coarse-quantized choice (`ivf_coarse_probe_cells`) replay
  // through the identical pruned-scan ∘ exact-rescore ∘ rank SQL
  private def ivfReplaySqlOver(probeDump: String) =
    "WITH a AS (SELECT vec_id, cell FROM read_parquet('{OUT}/ivf_assignments/*.parquet')), " +
      // the probe-cells dump is RANKED up to maxNprobe=16; rk <= 4 is the
      // nprobe=4 probe set these entries use
      s"p AS (SELECT query_id, cell FROM read_parquet('{OUT}/$probeDump/*.parquet') WHERE rk <= 4), " +
      "s AS (SELECT p.query_id, a.vec_id, " +
      "round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS cosine " +
      "FROM p JOIN a ON a.cell = p.cell " +
      "JOIN embeddings e ON e.vec_id = a.vec_id " +
      "JOIN embeddings q ON q.vec_id = p.query_id " +
      "WHERE a.vec_id <> p.query_id) " +
      "SELECT query_id, vec_id, cosine, rk FROM (" +
      "SELECT query_id, vec_id, cosine, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM s) " +
      "WHERE rk <= 10"

  private val ivfReplaySql = ivfReplaySqlOver("ivf_probe_cells")

  // the dumps carry their arrays as comma-joined strings (pandas-comparer
  // safety; see Pq.pqCodesEntry) — re-split and cast them back to lists here
  private val pqDumpCtes =
    "c AS (SELECT vec_id, list_transform(string_split(codes, ','), x -> CAST(x AS INTEGER)) AS codes " +
      "FROM read_parquet('{OUT}/pq_codes/*.parquet')), " +
      "q AS (SELECT query_id, list_transform(string_split(dtab, ','), x -> CAST(x AS DOUBLE)) AS dtab " +
      "FROM read_parquet('{OUT}/pq_query_dtabs/*.parquet'))"

  private val pqAdcCtes =
    s"$pqDumpCtes, " +
      "s AS (SELECT q.query_id, c.vec_id, " +
      "round(list_sum(list_transform(generate_series(1, 8), " +
      "m -> q.dtab[(m-1)*64 + c.codes[m] + 1])), 6) AS adc " +
      "FROM c, q WHERE c.vec_id <> q.query_id)"

  // the composition's shared prune inputs: coarse assignments + the
  // ranked probe-cells dump sliced at the entry nprobe. ONE definition —
  // the raw AND the residual composition replays both prune through it,
  // so an nprobe or dump-path change cannot leave the two replaying
  // different probe sets.
  private def ivfCompDumpCtesOver(probeDump: String) =
    "a AS (SELECT vec_id, cell FROM read_parquet('{OUT}/ivf_assignments/*.parquet')), " +
      s"p AS (SELECT query_id, cell FROM read_parquet('{OUT}/$probeDump/*.parquet') WHERE rk <= 4)"
  private val ivfCompDumpCtes = ivfCompDumpCtesOver("ivf_probe_cells")

  // The IVF×PQ composition replayed end-to-end from the four dumps: probed
  // cells → assignments prune the candidate set, ADC from the codes +
  // distance tables, rank ascending with vec_id tiebreak. ONE definition
  // shared by ivf_pq_topk and its two layout twins (_indexed, _compacted) —
  // they return the same rows by contract, and a future fix to the shared
  // ADC replay must not have to land three times.
  private def ivfPqTopkSqlOver(probeDump: String) =
    s"WITH $pqDumpCtes, ${ivfCompDumpCtesOver(probeDump)}, " +
      "s AS (SELECT p.query_id, c.vec_id, " +
      "round(list_sum(list_transform(generate_series(1, 8), " +
      "m -> q.dtab[(m-1)*64 + c.codes[m] + 1])), 6) AS adc " +
      "FROM p JOIN a ON a.cell = p.cell " +
      "JOIN c ON c.vec_id = a.vec_id " +
      "JOIN q ON q.query_id = p.query_id " +
      "WHERE c.vec_id <> p.query_id) " +
      "SELECT query_id, vec_id, adc, rk FROM (" +
      "SELECT query_id, vec_id, adc, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS rk FROM s) " +
      "WHERE rk <= 10"
  private val ivfPqTopkSql = ivfPqTopkSqlOver("ivf_probe_cells")

  // the residual composition's scorer: residual codes + PER-(query, cell)
  // tables (the IVFADC twist — the dtab join carries the cell key), pruned
  // by the same a/p CTEs as the raw composition
  private val pqResidualScoredCte =
    "rc AS (SELECT vec_id, list_transform(string_split(codes, ','), x -> CAST(x AS INTEGER)) AS codes " +
      "FROM read_parquet('{OUT}/pq_residual_codes/*.parquet')), " +
      "rq AS (SELECT query_id, cell, list_transform(string_split(dtab, ','), x -> CAST(x AS DOUBLE)) AS dtab " +
      "FROM read_parquet('{OUT}/pq_residual_dtabs/*.parquet')), " +
      "rs AS (SELECT p.query_id, rc.vec_id, " +
      "round(list_sum(list_transform(generate_series(1, 8), " +
      "m -> rq.dtab[(m-1)*64 + rc.codes[m] + 1])), 6) AS adc " +
      "FROM p JOIN a ON a.cell = p.cell " +
      "JOIN rc ON rc.vec_id = a.vec_id " +
      "JOIN rq ON rq.query_id = p.query_id AND rq.cell = p.cell " +
      "WHERE rc.vec_id <> p.query_id)"

  // the residual IVF×PQ composition replayed end-to-end from its two
  // dumps plus the shared assignment/probe dumps
  private val ivfPqResidualTopkSql =
    s"WITH $ivfCompDumpCtes, $pqResidualScoredCte " +
      "SELECT query_id, vec_id, adc, rk FROM (" +
      "SELECT query_id, vec_id, adc, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS rk FROM rs) " +
      "WHERE rk <= 10"

  // SQ8 compressed-domain scoring replayed from the codes dump alone: the
  // query side is the same dump's vec_id<5 slice and the metric is exact
  // integer squared-L2 — no float rounding anywhere before the rerank
  private val sqAdcCtes =
    "c AS (SELECT vec_id, list_transform(string_split(codes, ','), x -> CAST(x AS INTEGER)) AS codes " +
      "FROM read_parquet('{OUT}/sq_codes/*.parquet')), " +
      "q AS (SELECT vec_id AS query_id, codes AS qcodes FROM c WHERE vec_id < 5), " +
      "s AS (SELECT q.query_id, c.vec_id, " +
      "CAST(list_sum(list_transform(generate_series(1, 64), " +
      "i -> CAST(c.codes[i] - q.qcodes[i] AS BIGINT) * (c.codes[i] - q.qcodes[i]))) AS BIGINT) AS qdist " +
      "FROM c, q WHERE c.vec_id <> q.query_id)"

  // shared by its own entry and the embedding-clusters recursive CTE
  private val embeddingNearDupSql =
    "SELECT a.vec_id AS a_vec_id, b.vec_id AS b_vec_id, " +
      "round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine " +
      "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id " +
      "WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4"

  // shared tokenization CTE (trim + RE2 \s split, empty-safe) for the
  // corpus-frequency twins below
  private val toksCte =
    "t AS (SELECT doc_id, CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
      "ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks FROM documents)"

  private val sepSql = "chr(31)"

  // reproducible-curriculum CTE chain, shared by curriculum_order and
  // training_manifest: quality histogram → cumulative-from-top per-epoch
  // value threshold → gate → per-(epoch, doc) rows with the md5 shard and
  // the epoch-salted reshuffle hash; all exact integers
  private val curriculumCtes =
    s"st AS ($textStatsSql), " +
      "q AS (SELECT doc_id, CAST(round(quality_score * 10000) AS BIGINT) AS qm FROM st), " +
      "n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q), " +
      "hh AS (SELECT qm, count(*) AS c FROM q GROUP BY qm), " +
      "cum AS (SELECT qm, CAST(sum(c) OVER (ORDER BY qm DESC) AS BIGINT) AS cum FROM hh), " +
      "ep AS (SELECT CAST(unnest(generate_series(0, 2)) AS BIGINT) AS epoch), " +
      "thr AS (SELECT ep.epoch, max(cum.qm) AS thr FROM ep, cum, n " +
      "WHERE cum.cum >= (n.n * (ep.epoch + 1) + 2) // 3 GROUP BY ep.epoch), " +
      "m AS (SELECT t.epoch, q.doc_id, q.qm, " +
      "('0x' || substr(md5(CAST(q.doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard, " +
      "md5(CAST(t.epoch AS VARCHAR) || ':' || CAST(q.doc_id AS VARCHAR)) AS h " +
      "FROM q JOIN thr t ON q.qm >= t.thr)"

  /** Per-symbol corpus counts over the working table's wrapped states —
    * the WordPiece likelihood denominator's inputs. */
  private val symCountsSql =
    "SELECT sym, CAST(sum(cnt) AS BIGINT) AS sc FROM " +
      s"(SELECT cnt, unnest(string_split(trim(state, $sepSql), $sepSql || $sepSql)) AS sym FROM st) " +
      "GROUP BY 1"

  /** Recursive LEARN-loop skeleton shared by the BPE and WordPiece vocab
    * replays — the round-12 upgrade that turned both learn stages from
    * rows-only dumps into hash-checked derivations. Each word's current
    * segmentation rides as a chr(31)-wrapped symbol string (every
    * symbol individually wrapped, so a pair match is the six-part
    * pattern SEP a SEP SEP b SEP): SQL `replace()` substitutes
    * non-overlapping matches left-to-right, which is EXACTLY the Scala
    * merge application (emit merged, skip both symbols, continue after) —
    * and a merged symbol is strictly longer than its left part, so a
    * just-merged token can never false-match as the next pair's left. One
    * recursive round per merge, 50 rounds; the round's best pair `bp` is a
    * scalar subquery over the working table (DuckDB supports aggregation
    * and multiple self-references in the recursive term), and recursion
    * stops early if no pairs remain (empty `bp` empties the cross join —
    * the Scala pairCounts.isEmpty exit). The top-10000 word-count table
    * replicates the fixture's (count DESC, word) driver collect. */
  private def learnLoopCtes(contMark: String, mergedSql: String,
      argmaxSql: String): String =
    s"$toksCte, " +
      "wc AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt " +
      "FROM (SELECT unnest(toks) AS word FROM t) GROUP BY word " +
      "ORDER BY cnt DESC, word LIMIT 10000), " +
      "init AS (SELECT word, cnt, " +
      "array_to_string(list_transform(generate_series(1, len(word)), " +
      s"i -> $sepSql || CASE WHEN i = 1 THEN '' ELSE '$contMark' END || word[i:i] || $sepSql), '') AS state " +
      "FROM wc), " +
      "st AS (SELECT 0 AS rnd, word, cnt, state, " +
      "CAST(NULL AS VARCHAR) AS l, CAST(NULL AS VARCHAR) AS r, " +
      "CAST(NULL AS VARCHAR) AS merged FROM init " +
      "UNION ALL " +
      s"SELECT rnd + 1, word, cnt, " +
      s"replace(state, $sepSql || bp.a || $sepSql || $sepSql || bp.b || $sepSql, " +
      s"$sepSql || $mergedSql || $sepSql), " +
      s"bp.a, bp.b, $mergedSql " +
      s"FROM st, ($argmaxSql) bp WHERE rnd < 50)"

  // Okapi BM25 replay, shared by its own entry and the RRF fusion: the tf
  // part exact-rational (k1=6/5, b=3/4 clear denominators), ln() micro-
  // quantized per term, per-doc scores exact BIGINT sums. The num/den
  // terms widen to DOUBLE before any multiplication (the identical
  // left-associated IEEE dag as Bm25.weightMicros): Int64 products of
  // tf·Σdl wrap in Spark / raise in DuckDB past ~9e17 — the 100 TB corpus
  // regime — while the double dag computes the same (identically IEEE-
  // rounded) value at any scale
  private val bm25Sql =
    s"WITH $toksCte, " +
      "l AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM t), " +
      "sc AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_dl FROM l), " +
      "e AS (SELECT doc_id, unnest(toks) AS term FROM t), " +
      "q AS (SELECT DISTINCT doc_id AS query_id, term FROM e WHERE doc_id < 3), " +
      "qv AS (SELECT DISTINCT term FROM q), " +
      "p AS (SELECT e.doc_id, e.term FROM e JOIN qv USING (term)), " +
      "dfd AS (SELECT term, count(*)::BIGINT AS df FROM " +
      "(SELECT DISTINCT doc_id, term FROM p) GROUP BY term), " +
      "idf AS (SELECT term, CAST(round(ln((sc.n_docs - df + 0.5) / (df + 0.5) + 1.0) " +
      "* 1000000) AS BIGINT) AS idf_micros FROM dfd, sc), " +
      "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM p GROUP BY 1, 2), " +
      "w AS (SELECT tf.doc_id, tf.term, CAST(round(idf.idf_micros * " +
      "(22 * tf.tf::DOUBLE * sc.total_dl) / " +
      "(10 * tf.tf::DOUBLE * sc.total_dl + 3 * sc.total_dl::DOUBLE + 9 * sc.n_docs::DOUBLE * l.dl)) " +
      "AS BIGINT) AS wm FROM tf JOIN l USING (doc_id) JOIN idf USING (term), sc), " +
      "s AS (SELECT q.query_id, w.doc_id, CAST(sum(w.wm) AS BIGINT) AS score_micros " +
      "FROM w JOIN q USING (term) WHERE w.doc_id <> q.query_id GROUP BY 1, 2) " +
      "SELECT query_id, CAST(rk AS BIGINT) AS rk, doc_id, score_micros FROM (" +
      "SELECT query_id, doc_id, score_micros, row_number() OVER (" +
      "PARTITION BY query_id ORDER BY score_micros DESC, doc_id) AS rk FROM s) " +
      "WHERE rk <= 10 ORDER BY query_id, rk"

  // chunk CTEs shared by doc_chunks and packed_sequences: stride-64 slices
  // over the shared tokenization, ragged tail truncating like Spark's slice
  private val chunksCtes =
    s"$toksCte, nz AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0), " +
      "c AS (SELECT doc_id, unnest(generate_series(0, (len(toks)-1)//64)) AS chunk_id, toks FROM nz), " +
      "ch AS (SELECT doc_id, chunk_id, " +
      "len(toks[chunk_id*64+1 : chunk_id*64+64]) AS n_chunk_tokens, " +
      "md5(array_to_string(toks[chunk_id*64+1 : chunk_id*64+64], ' ')) AS chunk_md5 FROM c)"

  // duplicated-span CTE chain shared by dup_spans, span_trimmed_corpus,
  // and the trimmed_release_corpus composition: positional 0-based 8-gram
  // starts, grams occurring 2+ times corpus-wide, covered starts merged
  // gap-and-island (starts p1 < p2 touch iff p2 <= p1 + 8) into maximal
  // [span_start, span_end] token spans. Parameterized over the (doc_id,
  // text) source so the span stage can run over `documents` or over a
  // composed survivor CTE.
  private def spanCtesOver(src: String): String =
    s"t AS MATERIALIZED (SELECT doc_id, CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
      s"ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks FROM $src), " +
      "ps AS (SELECT doc_id, unnest(generate_series(0, len(toks)-8)) AS p, toks FROM t WHERE len(toks) >= 8), " +
      "oc AS MATERIALIZED (SELECT doc_id, p, array_to_string(toks[p+1:p+8], ' ') AS gram FROM ps), " +
      "dg AS (SELECT gram FROM oc GROUP BY gram HAVING count(*) >= 2), " +
      "cv AS MATERIALIZED (SELECT oc.doc_id, oc.p FROM oc JOIN dg USING (gram)), " +
      "il AS (SELECT doc_id, p, CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 8 " +
      "THEN 0 ELSE 1 END AS brk FROM cv), " +
      "gi AS (SELECT doc_id, p, sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS grp FROM il), " +
      "sp AS (SELECT doc_id, min(p) AS span_start, max(p) + 7 AS span_end, " +
      "max(p) + 8 - min(p) AS n_span_tokens FROM gi GROUP BY doc_id, grp)"

  private val dupSpansCtes = spanCtesOver("documents")

  // benchmark-overlap variant of the span chain: same t/ps/oc explode over
  // the TRAINABLE slice, covered = grams present in the benchmark slice's
  // distinct gram set (exact strings — the Spark side's xxhash64 probe can
  // only ADD covered positions at ~B²/2^65 probability), same island merge
  // and trim tail
  private val contamSpanCtes =
    "t AS MATERIALIZED (SELECT doc_id, CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
      "ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks " +
      "FROM documents WHERE doc_id % 10 <> 0), " +
      "ps AS (SELECT doc_id, unnest(generate_series(0, len(toks)-8)) AS p, toks FROM t WHERE len(toks) >= 8), " +
      "oc AS MATERIALIZED (SELECT doc_id, p, array_to_string(toks[p+1:p+8], ' ') AS gram FROM ps), " +
      "bt AS (SELECT CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
      "ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks " +
      "FROM documents WHERE doc_id % 10 = 0), " +
      "bg AS (SELECT DISTINCT gram FROM (SELECT unnest(CASE WHEN len(toks) < 8 THEN [] " +
      "ELSE list_distinct(list_transform(generate_series(1, len(toks)-7), " +
      "i -> array_to_string(toks[i:i+7], ' '))) END) AS gram FROM bt)), " +
      "cv AS MATERIALIZED (SELECT oc.doc_id, oc.p FROM oc JOIN bg USING (gram)), " +
      "il AS (SELECT doc_id, p, CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 8 " +
      "THEN 0 ELSE 1 END AS brk FROM cv), " +
      "gi AS (SELECT doc_id, p, sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS grp FROM il), " +
      "sp AS (SELECT doc_id, min(p) AS span_start, max(p) + 7 AS span_end, " +
      "max(p) + 8 - min(p) AS n_span_tokens FROM gi GROUP BY doc_id, grp)"

  // the trim tail over spanCtesOver's t/cv: covered starts → covered token
  // indexes → kept tokens re-joined in position order → tr = (doc_id,
  // n_tokens, n_dropped_tokens, text_trimmed); span-free and all-span docs
  // both surface via the left joins
  private val spanTrimTailCtes = spanTrimTailOver(
    "SELECT doc_id, unnest(generate_series(p, p+7)) AS ti FROM cv")

  // the trim tail parameterized by its covered-token-index source (the
  // default form expands covered STARTS from cv; the long-span form expands
  // the merged spans surviving the length filter)
  private def spanTrimTailOver(coveredIdx: String): String =
    s"ctk AS (SELECT DISTINCT doc_id, ti FROM ($coveredIdx)), " +
      "at AS (SELECT doc_id, unnest(generate_series(0, len(toks)-1)) AS ti, toks FROM t WHERE len(toks) > 0), " +
      "kp AS (SELECT a.doc_id, a.ti, a.toks[a.ti+1] AS tok FROM at a " +
      "LEFT JOIN ctk c ON a.doc_id = c.doc_id AND a.ti = c.ti WHERE c.ti IS NULL), " +
      "ka AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY ti) AS text_trimmed, " +
      "count(*) AS n_kept FROM kp GROUP BY doc_id), " +
      "tr AS MATERIALIZED (SELECT t.doc_id, len(t.toks) AS n_tokens, " +
      "len(t.toks) - coalesce(ka.n_kept, 0) AS n_dropped_tokens, " +
      "coalesce(ka.text_trimmed, '') AS text_trimmed " +
      "FROM t LEFT JOIN ka ON t.doc_id = ka.doc_id)"

  // the deterministic planted-PII text derivation (Pii.plantedDocs's twin),
  // shared by the sweep, the redacted_corpus composition, and corpus_diff
  private val plantedTxtSql =
    "coalesce(text,'') || " +
      "CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END || " +
      "CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0') ELSE '' END || " +
      "CASE WHEN doc_id % 11 = 0 THEN ' from 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id * 3 % 256 AS VARCHAR) ELSE '' END"

  // the planted-PII sweep body, shared by its own entry and the
  // redacted_corpus composition (identical planting arithmetic + identical
  // regex strings interpolated from Pii's constants)
  private val piiRedactionSql =
    s"WITH p AS (SELECT doc_id, $plantedTxtSql AS txt FROM documents) " +
      s"SELECT doc_id, len(regexp_extract_all(txt, '${graft.operators.Pii.EmailRe}')) AS n_emails, " +
      s"len(regexp_extract_all(txt, '${graft.operators.Pii.PhoneRe}')) AS n_phones, " +
      s"len(regexp_extract_all(txt, '${graft.operators.Pii.IpRe}')) AS n_ips, " +
      s"regexp_replace(regexp_replace(regexp_replace(txt, '${graft.operators.Pii.EmailRe}', '<EMAIL>', 'g'), " +
      s"'${graft.operators.Pii.PhoneRe}', '<PHONE>', 'g'), '${graft.operators.Pii.IpRe}', '<IP>', 'g') AS text_redacted " +
      "FROM p"

  private val langIdSql =
    "WITH t AS (SELECT doc_id, CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
      "ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks FROM documents), " +
      "h AS (SELECT doc_id, " +
      "len(list_filter(toks, x -> list_contains(['the','a','of','and','to','is','in'], x))) AS n_en, " +
      "len(list_filter(toks, x -> list_contains(['le','la','les','de','et','un','est'], x))) AS n_fr, " +
      "len(list_filter(toks, x -> list_contains(['el','los','las','de','y','un','es'], x))) AS n_es FROM t) " +
      "SELECT doc_id, n_en, n_fr, n_es, " +
      "CASE WHEN n_en >= n_fr AND n_en >= n_es THEN 'en' " +
      "WHEN n_fr >= n_es THEN 'fr' ELSE 'es' END AS lang_guess FROM h"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "scan_count" ->
      "SELECT count(*) AS n_rows FROM documents",
    "groupby_text_count" ->
      "SELECT text, count(*) AS n FROM documents GROUP BY text",
    "select_text_notnull_limit" ->
      "SELECT doc_id, text FROM documents WHERE text IS NOT NULL ORDER BY doc_id LIMIT 5",
    "lang_filter_fr" ->
      "SELECT doc_id, text, lang FROM documents WHERE starts_with(coalesce(lang, ''), 'fr')",
    "sanitize_projection" ->
      ("SELECT doc_id, regexp_replace(replace(replace(translate(coalesce(text, ''), chr(9) || '\"', ''), " +
        "'[' || chr(13) || chr(10) || ']', ''), ',', ''''), '[\\p{C}]', '', 'g') AS text_clean FROM documents"),
    "timestamp_format" ->
      "SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') || '.0' AS created_at_text FROM events ORDER BY event_id LIMIT 1000",
    // quirk Q5: Row.toString wraps the single column in brackets
    "row_strings" ->
      "SELECT '[' || text || ']' AS value FROM documents WHERE text IS NOT NULL",
    "encode_pipe_line" ->
      ("SELECT doc_id, regexp_replace(replace(replace(translate(coalesce(text, ''), chr(9) || '\"', ''), " +
        "'[' || chr(13) || chr(10) || ']', ''), ',', ''''), '[\\p{C}]', '', 'g') || '|' || coalesce(lang, '') || '|' || coalesce(source, '') AS line " +
        "FROM documents"),
    "q1_pricing_summary" ->
      ("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, " +
        "round(sum(l_extendedprice), 2) AS sum_base_price, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, " +
        "round(avg(l_quantity), 4) AS avg_qty, round(avg(l_discount), 4) AS avg_disc, " +
        "count(*) AS count_order FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "q3_top_revenue" ->
      ("SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey " +
        "WHERE c_mktsegment = 'BUILDING' GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10"),
    "q5_nation_revenue" ->
      ("SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, count(*) AS n_items " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY n_name ORDER BY n_name"),
    "top_orders_per_priority" ->
      ("SELECT o_orderpriority, o_orderkey, o_totalprice, rk FROM (" +
        "SELECT o_orderpriority, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rk " +
        "FROM orders) t WHERE rk <= 3 ORDER BY o_orderpriority, rk"),
    "distinct_parts" ->
      ("SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    // sketch error envelope: DuckDB replays the exact side and literal
    // TRUEs — the HLL estimate drifting out of its 5-sigma band flips a
    // Spark-side boolean and the hash goes red
    "distinct_parts_envelope" ->
      ("SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps, " +
        "TRUE AS parts_within_tol, TRUE AS supps_within_tol " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "customers_without_orders" ->
      ("SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) ORDER BY c_custkey"),
    // integer-cents boundary arithmetic: double avg would flip borderline
    // rows between engines (summation order)
    "orders_above_cust_avg" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders o " +
        "WHERE 2 * CAST(round(o_totalprice * 100) AS BIGINT) * " +
        "(SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) " +
        "> 3 * (SELECT sum(CAST(round(o3.o_totalprice * 100) AS BIGINT)) " +
        "FROM orders o3 WHERE o3.o_custkey = o.o_custkey)"),
    // identical integer-cents accumulation inside a value-RANGE frame
    "rolling_customer_spend" ->
      ("SELECT o_orderkey, o_custkey, " +
        "round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (" +
        "PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT) " +
        "RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100 + 1e-9, 2) " +
        "AS spend_30d FROM orders"),
    "repeat_customers" ->
      ("SELECT o_custkey FROM orders WHERE year(o_orderdate) < 1998 " +
        "INTERSECT " +
        "SELECT o_custkey FROM orders WHERE year(o_orderdate) >= 1998 " +
        "ORDER BY o_custkey"),
    "skew_salted_join" ->
      ("SELECT o_orderkey, o_custkey, c_mktsegment, c_nationkey, " +
        "o_totalprice FROM orders JOIN customer ON o_custkey = c_custkey"),
    // z from HUGEINT-exact moments (the decimal(38,0) twin of Spark's
    // accumulation); the only float step is the final division, r6
    "quality_calibration" ->
      (s"WITH st AS ($textStatsSql), " +
        "j AS (SELECT st.doc_id, d.source, st.quality_score, " +
        "CAST(round(st.quality_score * 10000) AS BIGINT) AS qm " +
        "FROM st JOIN documents d USING (doc_id)), " +
        "m AS (SELECT source, CAST(count(*) AS HUGEINT) AS n, " +
        "CAST(sum(qm) AS HUGEINT) AS s, CAST(sum(qm*qm) AS HUGEINT) AS q2 " +
        "FROM j GROUP BY source) " +
        "SELECT j.doc_id, j.source, j.quality_score, " +
        "round(CAST(m.n * j.qm - m.s AS DOUBLE) / " +
        "sqrt(CAST(m.n * m.q2 - m.s * m.s AS DOUBLE)), 6) AS z " +
        "FROM j JOIN m USING (source)"),
    // total grams = Σ max(len−2, 0) (no explode); distinct grams via the
    // same space-joined trigram shingle as the doc-freq family
    "source_ngram_diversity" ->
      ("WITH t AS (SELECT source, CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
        "ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks FROM documents), " +
        "tot AS (SELECT source, CAST(sum(greatest(len(toks) - 2, 0)) AS BIGINT) AS total_grams " +
        "FROM t GROUP BY source), " +
        "g AS (SELECT source, CASE WHEN len(toks) < 3 THEN [] " +
        "ELSE list_distinct(list_transform(generate_series(1, len(toks)-2), " +
        "i -> array_to_string(toks[i:i+2], ' '))) END AS grams FROM t), " +
        "d AS (SELECT source, count(DISTINCT gram) AS distinct_grams FROM " +
        "(SELECT source, unnest(grams) AS gram FROM g) GROUP BY source) " +
        "SELECT source, total_grams, distinct_grams, " +
        "round(distinct_grams::DOUBLE / greatest(total_grams, 1)::DOUBLE, 6) AS diversity " +
        "FROM tot JOIN d USING (source) ORDER BY source"),
    // the same conditional counts, per-term micro-quantized ln, identical
    // contribution dag; top-20 by |drift|
    "vocab_drift" ->
      (s"WITH $toksCte, " +
        "e AS (SELECT doc_id % 10 = 1 AS in_batch, unnest(toks) AS term FROM t), " +
        "c AS (SELECT term, CAST(sum(CASE WHEN in_batch THEN 1 ELSE 0 END) AS BIGINT) AS tf_b, " +
        "CAST(sum(CASE WHEN in_batch THEN 0 ELSE 1 END) AS BIGINT) AS tf_c FROM e GROUP BY term), " +
        "sc AS (SELECT CAST(sum(tf_b) AS BIGINT) AS t_b, CAST(sum(tf_c) AS BIGINT) AS t_c, " +
        "count(*)::BIGINT AS v FROM c), " +
        "d AS (SELECT term, tf_b, tf_c, CAST(round(ln(((tf_b + 1) * (sc.t_c + sc.v))::DOUBLE / " +
        "((tf_c + 1) * (sc.t_b + sc.v))::DOUBLE) * 1000000) AS BIGINT) AS ln_micros FROM c, sc), " +
        "f AS (SELECT term, tf_b, tf_c, CAST(round(((tf_b + 1) * ln_micros)::DOUBLE / " +
        "(sc.t_b + sc.v)::DOUBLE) AS BIGINT) AS drift_micros FROM d, sc) " +
        "SELECT term, tf_b, tf_c, drift_micros FROM f " +
        "ORDER BY abs(drift_micros) DESC, term LIMIT 20"),
    // exact anchor of the HLL tier: same whitespace tokenization as the
    // corpus-frequency family
    "source_token_cardinality" ->
      ("WITH t AS (SELECT source, CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
        "ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks FROM documents), " +
        "e AS (SELECT source, unnest(toks) AS tok FROM t) " +
        "SELECT source, count(DISTINCT tok) AS n_distinct_tokens " +
        "FROM e GROUP BY source ORDER BY source"),
    // HLL error envelope (see distinct_parts_envelope)
    "token_cardinality_envelope" ->
      ("WITH t AS (SELECT source, CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
        "ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks FROM documents), " +
        "e AS (SELECT source, unnest(toks) AS tok FROM t) " +
        "SELECT source, count(DISTINCT tok) AS n_distinct_tokens, TRUE AS within_tol " +
        "FROM e GROUP BY source ORDER BY source"),
    // file skipping is an execution choice, not a semantic: the zone-map
    // probe must return exactly the plain filter's rows — hash equality
    // against the full-scan SQL IS the skipping correctness contract
    "zonemap_pruned_scan" ->
      ("SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM lineitem " +
        "WHERE l_partkey BETWEEN 20 AND 60 AND l_suppkey BETWEEN 2 AND 8"),
    // Morton arithmetic generated from the SAME (shift, mask) step table
    // as the Spark expression (ZOrder.spreadSql) — the engines can't drift
    "zorder_values" ->
      (s"SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, " +
        s"$zvalSql AS zval FROM lineitem"),
    "zorder_locality" ->
      (s"WITH z AS (SELECT l_partkey, l_suppkey, $zvalSql AS zval FROM lineitem) " +
        "SELECT zval >> 24 AS zbucket, count(*) AS n, " +
        "min(l_partkey) AS min_part, max(l_partkey) AS max_part, " +
        "min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp " +
        "FROM z GROUP BY 1 ORDER BY 1"),
    "salted_distinct_users" ->
      ("SELECT event_type, count(DISTINCT user_id) AS n_distinct " +
        "FROM events GROUP BY event_type"),
    "user_type_pivot" ->
      ("SELECT user_id, " +
        "count(*) FILTER (event_type = 'click') AS click, " +
        "count(*) FILTER (event_type = 'error') AS error, " +
        "count(*) FILTER (event_type = 'purchase') AS purchase, " +
        "count(*) FILTER (event_type = 'signup') AS signup, " +
        "count(*) FILTER (event_type = 'view') AS view " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    "events_hourly" ->
      ("SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start, event_type, " +
        "count(*) AS n, round(sum(value), 2) AS sum_value FROM events " +
        "GROUP BY 1, 2 ORDER BY hour_start, event_type"),
    "json_props_agg" ->
      ("SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
        "count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k, " +
        "max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "user_activity" ->
      ("SELECT user_id, count(*) AS n_events, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts, " +
        "strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts, round(sum(value), 2) AS total_value " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    "user_sessions" ->
      ("WITH f AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL " +
        "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS flag " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
        "s AS (SELECT user_id, sum(flag) OVER (PARTITION BY user_id ORDER BY ts " +
        "ROWS UNBOUNDED PRECEDING) AS sid FROM f) " +
        "SELECT user_id, count(*) AS n_events, CAST(max(sid) AS BIGINT) AS n_sessions, " +
        "round(count(*)::DOUBLE / max(sid) + 1e-9, 4) AS avg_session_events " +
        "FROM s GROUP BY user_id ORDER BY user_id"),
    // identical sessionization (30-min gap, ts+event_id order), ordered
    // string_agg path, count-desc-then-path top-20
    "session_paths" ->
      ("WITH f AS (SELECT user_id, ts, event_id, event_type, " +
        "CASE WHEN lag(ts) OVER w IS NULL " +
        "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS flag " +
        "FROM events WHERE user_id IS NOT NULL " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT user_id, ts, event_id, event_type, " +
        "sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS UNBOUNDED PRECEDING) AS sid FROM f), " +
        "p AS (SELECT user_id, sid, string_agg(event_type, '>' ORDER BY ts, event_id) AS path " +
        "FROM s GROUP BY 1, 2) " +
        "SELECT path, count(*) AS n_sessions FROM p GROUP BY path " +
        "ORDER BY n_sessions DESC, path LIMIT 20"),
    // identical lead() sequence (ts, event_id tiebreak), row-normalized
    // after each engine's own division, r6
    "event_transitions" ->
      ("WITH p AS (SELECT user_id, event_type, lead(event_type) OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id) AS next_type " +
        "FROM events WHERE user_id IS NOT NULL), " +
        "c AS (SELECT event_type, next_type, count(*) AS n FROM p " +
        "WHERE next_type IS NOT NULL GROUP BY 1, 2) " +
        "SELECT event_type, next_type, n, " +
        "round(n::DOUBLE / sum(n) OVER (PARTITION BY event_type)::DOUBLE, 6) AS p " +
        "FROM c ORDER BY event_type, next_type"),
    // same sequential conditional minima: first view, first click after
    // it, first purchase after that — strict > on full-precision ts
    "conversion_funnel" ->
      ("WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events " +
        "WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1), " +
        "s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e " +
        "JOIN s1 ON e.user_id = s1.user_id " +
        "WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1), " +
        "s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e " +
        "JOIN s2 ON e.user_id = s2.user_id " +
        "WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1) " +
        "SELECT s1.user_id, strftime(s1.t1, '%Y-%m-%d %H:%M:%S') AS view_ts, " +
        "strftime(s2.t2, '%Y-%m-%d %H:%M:%S') AS click_ts, " +
        "strftime(s3.t3, '%Y-%m-%d %H:%M:%S') AS purchase_ts, " +
        "CAST(1 + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END + " +
        "CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END AS INTEGER) AS stages_completed " +
        "FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id " +
        "LEFT JOIN s3 ON s1.user_id = s3.user_id"),
    // both week stamps are date_trunc('week') values in a UTC session, so
    // the offset is an exact 604800-second multiple in either engine
    "cohort_retention" ->
      ("WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort " +
        "FROM events WHERE user_id IS NOT NULL GROUP BY 1), " +
        "a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk " +
        "FROM events WHERE user_id IS NOT NULL) " +
        "SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week, " +
        "CAST((CAST(epoch(a.wk) AS BIGINT) - CAST(epoch(f.cohort) AS BIGINT)) // 604800 AS BIGINT) AS week_offset, " +
        "count(DISTINCT a.user_id) AS n_active " +
        "FROM a JOIN f ON a.user_id = f.user_id GROUP BY 1, 2"),
    "value_quantiles" ->
      ("SELECT event_type, " +
        "round(quantile_cont(value, 0.25) + 1e-9, 4) AS p25, " +
        "round(quantile_cont(value, 0.5) + 1e-9, 4) AS p50, " +
        "round(quantile_cont(value, 0.75) + 1e-9, 4) AS p75, " +
        "round(quantile_cont(value, 0.95) + 1e-9, 4) AS p95 " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    // quantile-sketch error envelope (see distinct_parts_envelope)
    "value_quantiles_envelope" ->
      ("SELECT event_type, " +
        "round(quantile_cont(value, 0.25) + 1e-9, 4) AS p25, " +
        "round(quantile_cont(value, 0.5) + 1e-9, 4) AS p50, " +
        "round(quantile_cont(value, 0.75) + 1e-9, 4) AS p75, " +
        "round(quantile_cont(value, 0.95) + 1e-9, 4) AS p95, " +
        "TRUE AS p25_within_tol, TRUE AS p50_within_tol, " +
        "TRUE AS p75_within_tol, TRUE AS p95_within_tol " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    // same session intervals derived with the same window logic, then a
    // native inequality join — an independent implementation of the
    // bucketed range join's containment semantics
    "event_session_attribution" ->
      ("WITH f AS (SELECT user_id, event_id, ts, CASE WHEN lag(ts) OVER w IS NULL " +
        "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS flag " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
        "s AS (SELECT user_id, ts, sum(flag) OVER (PARTITION BY user_id ORDER BY ts " +
        "ROWS UNBOUNDED PRECEDING) AS session_id FROM f), " +
        "iv AS (SELECT user_id, CAST(session_id AS BIGINT) AS session_id, " +
        "min(ts) AS session_start, max(ts) AS session_end " +
        "FROM s GROUP BY user_id, session_id) " +
        "SELECT e.event_id, e.user_id, iv.session_id, " +
        "(epoch_us(e.ts) - epoch_us(iv.session_start)) // 1000000 AS secs_into_session " +
        "FROM events e JOIN iv ON e.user_id = iv.user_id " +
        "AND e.ts >= iv.session_start AND e.ts <= iv.session_end"),
    // native inequality join over the same hour window — independent
    // implementation of the bucketed interval-attribution semantics
    "purchase_click_attribution" ->
      ("SELECT p.event_id AS purchase_id, p.user_id, " +
        "count(*) AS n_clicks_1h, max(c.event_id) AS last_click_id " +
        "FROM events p JOIN events c ON p.event_type = 'purchase' " +
        "AND c.event_type = 'click' AND c.user_id = p.user_id " +
        "AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000 " +
        "AND epoch_us(c.ts) <= epoch_us(p.ts) " +
        "GROUP BY p.event_id, p.user_id"),
    // DuckDB's native ASOF JOIN with the same strict > bound — an
    // independent implementation of the same temporal-join semantics
    "last_purchase_asof" ->
      ("WITH p AS (SELECT user_id, ts, max(event_id) AS last_purchase_id " +
        "FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) " +
        "SELECT e.event_id, e.user_id, e.event_type, p.last_purchase_id, " +
        "(epoch_us(e.ts) - epoch_us(p.ts)) // 1000000 AS secs_since_purchase " +
        "FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts > p.ts"),
    // identical integer-cents moment test in HUGEINT (DuckDB's decimal128
    // counterpart of the Spark side's decimal(38,0) products)
    "value_outliers" ->
      ("WITH e AS (SELECT event_id, event_type, value, " +
        "CAST(round(value * 100) AS BIGINT) AS c FROM events), " +
        "st AS (SELECT event_type, count(*) AS n, " +
        "CAST(sum(c) AS HUGEINT) AS s, CAST(sum(c*c) AS HUGEINT) AS q " +
        "FROM e GROUP BY 1) " +
        "SELECT event_id, event_type, value FROM e JOIN st USING (event_type) " +
        "WHERE (n::HUGEINT * c - s) * (n::HUGEINT * c - s) > 9 * (n::HUGEINT * q - s * s)"),
    // same planted-text derivation as the PII twin; sha256 content
    // identity; FULL OUTER join replayed natively
    "corpus_diff" ->
      (s"WITH o AS (SELECT doc_id, sha256(coalesce(text,'')) AS oh FROM documents), " +
        s"n AS (SELECT doc_id, sha256($plantedTxtSql) AS nh FROM documents WHERE doc_id % 7 <> 0) " +
        "SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, " +
        "CASE WHEN o.doc_id IS NULL THEN 'added' WHEN n.doc_id IS NULL THEN 'removed' " +
        "WHEN oh = nh THEN 'unchanged' ELSE 'changed' END AS status " +
        "FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id"),
    // BIGINT vocab counts joined back, BIGINT per-doc sums, one final
    // IEEE division (+1e-9 nudge, 6 dp)
    // LM scoring replayed from the dumped model: DuckDB re-derives each
    // doc's positional bigrams, probes bigram → context-default → global
    // marker ('' row), sums negated micros as BIGINT, one final division
    "lm_perplexity_scores" ->
      (s"WITH $toksCte, " +
        "ps AS (SELECT doc_id, unnest(generate_series(0, len(toks)-2)) AS p, toks FROM t WHERE len(toks) >= 2), " +
        "oc AS (SELECT doc_id, array_to_string(toks[p+1:p+2], ' ') AS gram, toks[p+1] AS u FROM ps), " +
        "b AS (SELECT gram, lp_micros FROM read_parquet('{OUT}/lm_bigram_logprobs/*.parquet')), " +
        "ud AS (SELECT context, def_micros FROM read_parquet('{OUT}/lm_unigram_defaults/*.parquet')), " +
        "j AS (SELECT oc.doc_id, coalesce(b.lp_micros, ud.def_micros, " +
        "(SELECT def_micros FROM ud WHERE context = '')) AS lp " +
        "FROM oc LEFT JOIN b USING (gram) LEFT JOIN ud ON ud.context = oc.u) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, " +
        "CAST(sum(-lp) AS BIGINT) AS nll_micros, " +
        "round(sum(-lp)::DOUBLE / (1000000.0 * count(*)) + 1e-9, 6) AS mean_nll " +
        "FROM j GROUP BY doc_id"),
    // DSIR weights replayed from the dumped feature table: DuckDB's own
    // tokenization joins the micros ratios, the weight is an
    // order-independent BIGINT dot product — bit-exact by construction
    "dsir_doc_weights" ->
      (s"WITH $toksCte, ex AS (SELECT doc_id, unnest(toks) AS token FROM t), " +
        "dc AS (SELECT doc_id, token, count(*) AS cnt FROM ex GROUP BY 1, 2), " +
        "r AS (SELECT token, ratio_micros FROM read_parquet('{OUT}/dsir_token_ratios/*.parquet')) " +
        "SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens, " +
        "CAST(sum(cnt * ratio_micros) AS BIGINT) AS weight_micros " +
        "FROM dc JOIN r USING (token) GROUP BY doc_id"),
    // the selection cut: same weights, (weight desc, doc_id) rank, top 100
    "dsir_top_weighted" ->
      (s"WITH $toksCte, ex AS (SELECT doc_id, unnest(toks) AS token FROM t), " +
        "dc AS (SELECT doc_id, token, count(*) AS cnt FROM ex GROUP BY 1, 2), " +
        "r AS (SELECT token, ratio_micros FROM read_parquet('{OUT}/dsir_token_ratios/*.parquet')), " +
        "w AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens, " +
        "CAST(sum(cnt * ratio_micros) AS BIGINT) AS weight_micros " +
        "FROM dc JOIN r USING (token) GROUP BY doc_id) " +
        "SELECT doc_id, n_tokens, weight_micros, rk FROM (" +
        "SELECT doc_id, n_tokens, weight_micros, " +
        "CAST(row_number() OVER (ORDER BY weight_micros DESC, doc_id) AS BIGINT) AS rk " +
        "FROM w) WHERE rk <= 100"),
    "token_rarity" ->
      (s"WITH $toksCte, ex AS (SELECT doc_id, unnest(toks) AS token FROM t), " +
        "v AS (SELECT token, count(*) AS cnt FROM ex GROUP BY 1), " +
        "tot AS (SELECT count(*) AS n FROM ex), " +
        "d AS (SELECT ex.doc_id, CAST(sum(v.cnt) AS BIGINT) AS sum_cnt, count(*) AS n_tokens " +
        "FROM ex JOIN v USING (token) GROUP BY 1) " +
        "SELECT doc_id, n_tokens, " +
        "round(sum_cnt::DOUBLE / (n_tokens * (SELECT n FROM tot))::DOUBLE + 1e-9, 6) AS mean_token_freq FROM d"),
    // per-source curation twin: dedup identity = grouped text content
    // (min-doc_id keeper), contamination membership from the shared sweep
    // CTE, quality mass in exact 1e-4 units of the 4-dp-rounded score
    "source_curation_report" ->
      (s"WITH st AS ($textStatsSql), " +
        "k AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY coalesce(text, '')), " +
        s"ct AS ($ngramContaminationSql), " +
        "cd AS (SELECT DISTINCT doc_id FROM ct) " +
        "SELECT d.source, count(*) AS n_docs, " +
        "CAST(sum(CASE WHEN k.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup_docs, " +
        "CAST(sum(CASE WHEN cd.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_contaminated_docs, " +
        "CAST(sum(st.n_tokens) AS BIGINT) AS sum_tokens, " +
        "CAST(sum(CAST(round(st.quality_score * 1e4) AS BIGINT)) AS BIGINT) AS sum_quality_units " +
        "FROM documents d JOIN st ON st.doc_id = d.doc_id " +
        "LEFT JOIN k ON k.doc_id = d.doc_id " +
        "LEFT JOIN cd ON cd.doc_id = d.doc_id " +
        "GROUP BY d.source ORDER BY d.source"),
    // embedding audit twin: double-cast squares (a float×float square
    // rounds differently), IEEE-exact sqrt rounded at 6 dp, norm mass as
    // exact integer micros so the per-label sum is order-independent
    "embedding_profile" ->
      ("WITH v AS (SELECT label, CAST(len(embedding) AS BIGINT) AS dim, " +
        "CASE WHEN len(list_filter(embedding, x -> isnan(x))) > 0 THEN NULL " +
        "ELSE round(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum')) + 1e-9, 6) END AS norm, " +
        "len(list_filter(embedding, x -> isnan(x))) > 0 AS has_nan FROM embeddings) " +
        "SELECT label, count(*) AS n_vecs, min(dim) AS min_dim, max(dim) AS max_dim, " +
        "CAST(sum(CASE WHEN norm < 0.0001 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero, " +
        "CAST(sum(CASE WHEN has_nan THEN 1 ELSE 0 END) AS BIGINT) AS n_nan, " +
        "CAST(sum(CAST(round(norm * 1e6) AS BIGINT)) AS BIGINT) AS sum_norm_micros, " +
        "min(norm) AS min_norm, max(norm) AS max_norm " +
        "FROM v GROUP BY label ORDER BY label"),
    // per-column null/distinct/range audit, one UNION ALL branch per column
    "documents_profile" ->
      (Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
        s"""SELECT '$c' AS "column", count(*) - count($c) AS n_nulls, """ +
          s"count(DISTINCT $c) AS n_distinct, CAST(min($c) AS VARCHAR) AS min_value, " +
          s"CAST(max($c) AS VARCHAR) AS max_value FROM documents"
      }.mkString(" UNION ALL ")),
    "exact_dedup" -> exactDedupSql,
    // same group-by-hash shape over the C4-normalized form; DuckDB's
    // regexp_replace needs the 'g' flag (default replaces first match only)
    "normalized_dedup" ->
      ("SELECT sha256(trim(regexp_replace(lower(coalesce(text, '')), " +
        "'[^a-z0-9]+', ' ', 'g'))) AS norm_hash, min(doc_id) AS keep_doc_id, " +
        "count(*) AS n_dups, count(DISTINCT text) AS n_variants " +
        "FROM documents GROUP BY 1"),
    // bounded-Levenshtein verify replayed over the Spark-dumped LSH
    // candidates ({OUT} → Verify's output dir): DuckDB computes the full
    // distance and applies the threshold as the SAME exact-integer
    // criterion (d·10000 ≤ 2000·max_len ⟺ d ≤ the bound Spark handed to
    // its banded DP) — candidate recall lives in the band geometry, pinned
    // brute-force in DedupSpec
    "edit_near_dup" ->
      ("WITH c AS (SELECT a_doc_id, b_doc_id FROM read_parquet('{OUT}/edit_candidates/*.parquet')), " +
        "p AS (SELECT c.a_doc_id, c.b_doc_id, " +
        "levenshtein(coalesce(a.text, ''), coalesce(b.text, '')) AS d, " +
        "greatest(len(coalesce(a.text, '')), len(coalesce(b.text, ''))) AS ml " +
        "FROM c JOIN documents a ON c.a_doc_id = a.doc_id " +
        "JOIN documents b ON c.b_doc_id = b.doc_id) " +
        "SELECT a_doc_id, b_doc_id, CAST(d AS BIGINT) AS edit_dist, " +
        "round(1.0 - d::DOUBLE / ml, 4) AS edit_sim " +
        "FROM p WHERE d * 10000 <= 2000 * ml"),
    // tier matrix: MinHash pairs brute-forced, edit pairs replayed from
    // the candidates dump, SimHash pairs from the signatures dump, then
    // the same two full-outer joins + presence rollup
    "dedup_tier_overlap" ->
      (s"WITH nd AS ($nearDupPairsSql), " +
        "mh AS (SELECT a_doc_id, b_doc_id FROM nd), " +
        "ec AS (SELECT a_doc_id, b_doc_id FROM read_parquet('{OUT}/edit_candidates/*.parquet')), " +
        "ep AS (SELECT ec.a_doc_id, ec.b_doc_id, " +
        "levenshtein(coalesce(a.text, ''), coalesce(b.text, '')) AS d, " +
        "greatest(len(coalesce(a.text, '')), len(coalesce(b.text, ''))) AS ml " +
        "FROM ec JOIN documents a ON ec.a_doc_id = a.doc_id " +
        "JOIN documents b ON ec.b_doc_id = b.doc_id), " +
        "ed AS (SELECT a_doc_id, b_doc_id FROM ep WHERE d * 10000 <= 2000 * ml), " +
        "ss AS (SELECT doc_id, sh FROM read_parquet('{OUT}/simhash_signatures/*.parquet')), " +
        "sh AS (SELECT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id FROM ss a JOIN ss b " +
        "ON a.doc_id < b.doc_id WHERE bit_count(xor(a.sh, b.sh)) <= 3), " +
        "j1 AS (SELECT coalesce(mh.a_doc_id, ed.a_doc_id) AS a, " +
        "coalesce(mh.b_doc_id, ed.b_doc_id) AS b, " +
        "CASE WHEN mh.a_doc_id IS NOT NULL THEN 1 ELSE 0 END AS m, " +
        "CASE WHEN ed.a_doc_id IS NOT NULL THEN 1 ELSE 0 END AS e " +
        "FROM mh FULL JOIN ed ON mh.a_doc_id = ed.a_doc_id AND mh.b_doc_id = ed.b_doc_id), " +
        "j2 AS (SELECT coalesce(j1.m, 0) AS minhash, coalesce(j1.e, 0) AS edit, " +
        "CASE WHEN sh.a_doc_id IS NOT NULL THEN 1 ELSE 0 END AS simhash " +
        "FROM j1 FULL JOIN sh ON j1.a = sh.a_doc_id AND j1.b = sh.b_doc_id) " +
        "SELECT minhash, edit, simhash, count(*) AS n_pairs FROM j2 " +
        "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),
    // keep-best policy: family assignment via the recursive-CTE components
    // twin, quality from the textStats twin, argmax via window
    "quality_keep_dedup" ->
      (s"WITH RECURSIVE nd AS ($nearDupPairsSql), " +
        "sym AS (SELECT a_doc_id AS src, b_doc_id AS dst FROM nd " +
        "UNION ALL SELECT b_doc_id, a_doc_id FROM nd), " +
        "reach(node, label) AS (SELECT DISTINCT src, src FROM sym " +
        "UNION SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.node), " +
        "fam AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node), " +
        s"st AS ($textStatsSql), " +
        "j AS (SELECT f.cluster_id, f.doc_id, st.quality_score, " +
        "row_number() OVER (PARTITION BY f.cluster_id " +
        "ORDER BY st.quality_score DESC, f.doc_id) AS rk " +
        "FROM fam f JOIN st ON st.doc_id = f.doc_id) " +
        "SELECT cluster_id, max(CASE WHEN rk = 1 THEN doc_id END) AS keep_doc_id, " +
        "max(CASE WHEN rk = 1 THEN quality_score END) AS keep_quality, " +
        "count(*) AS n_members, min(doc_id) AS min_doc_id " +
        "FROM j GROUP BY cluster_id ORDER BY cluster_id"),
    // the shippable keep-best corpus: exact keepers minus non-keeper
    // family members (same recursive components + argmax twins)
    "quality_keep_corpus" ->
      (s"WITH RECURSIVE nd AS ($nearDupPairsSql), " +
        "sym AS (SELECT a_doc_id AS src, b_doc_id AS dst FROM nd " +
        "UNION ALL SELECT b_doc_id, a_doc_id FROM nd), " +
        "reach(node, label) AS (SELECT DISTINCT src, src FROM sym " +
        "UNION SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.node), " +
        "fam AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node), " +
        s"st AS ($textStatsSql), " +
        "j AS (SELECT f.cluster_id, f.doc_id, " +
        "row_number() OVER (PARTITION BY f.cluster_id " +
        "ORDER BY st.quality_score DESC, f.doc_id) AS rk " +
        "FROM fam f JOIN st ON st.doc_id = f.doc_id), " +
        "dec AS (SELECT cluster_id, max(CASE WHEN rk = 1 THEN doc_id END) AS keep_doc_id " +
        "FROM j GROUP BY cluster_id), " +
        "drops AS (SELECT f.doc_id FROM fam f JOIN dec ON f.cluster_id = dec.cluster_id " +
        "WHERE f.doc_id <> dec.keep_doc_id), " +
        s"k AS ($exactDedupSql) " +
        "SELECT d.doc_id, d.lang, d.n_chars FROM documents d " +
        "JOIN k ON d.doc_id = k.keep_doc_id " +
        "WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)"),
    // brute-force Hamming pairs over the Spark-computed aHashes (dumped by
    // image_phash_dump): the independent twin of the multi-index
    // (pigeonhole) candidate join + exact verify, same shape as simhash
    "image_phash_near_dup" ->
      ("WITH s AS (SELECT media_id, ahash FROM read_parquet('{OUT}/image_phash_dump/*.parquet')) " +
        "SELECT a.media_id AS a_media_id, b.media_id AS b_media_id, " +
        "CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming " +
        "FROM s a JOIN s b ON a.media_id < b.media_id " +
        "WHERE bit_count(xor(a.ahash, b.ahash)) <= 6"),
    // incremental probe: brute-force batch×corpus Hamming from the same
    // dumped signatures (corpus = media_id < 150, batch = the rest)
    "incremental_phash_near_dup" ->
      ("WITH s AS (SELECT media_id, ahash FROM read_parquet('{OUT}/image_phash_dump/*.parquet')) " +
        "SELECT b.media_id AS new_media_id, a.media_id AS dup_of_media_id, " +
        "CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming " +
        "FROM s a, s b WHERE a.media_id < 150 AND b.media_id >= 150 " +
        "AND bit_count(xor(a.ahash, b.ahash)) <= 6 " +
        "ORDER BY new_media_id, dup_of_media_id"),
    // audio and video twins of the image_phash oracle: brute-force Hamming
    // over the dumped fingerprints/temporal hashes
    "audio_fp_near_dup" ->
      ("WITH s AS (SELECT media_id, afp FROM read_parquet('{OUT}/audio_fp_dump/*.parquet')) " +
        "SELECT a.media_id AS a_media_id, b.media_id AS b_media_id, " +
        "CAST(bit_count(xor(a.afp, b.afp)) AS INTEGER) AS hamming " +
        "FROM s a JOIN s b ON a.media_id < b.media_id " +
        "WHERE bit_count(xor(a.afp, b.afp)) <= 6"),
    "video_thash_near_dup" ->
      ("WITH s AS (SELECT media_id, vhash FROM read_parquet('{OUT}/video_thash_dump/*.parquet')) " +
        "SELECT a.media_id AS a_media_id, b.media_id AS b_media_id, " +
        "CAST(bit_count(xor(a.vhash, b.vhash)) AS INTEGER) AS hamming " +
        "FROM s a JOIN s b ON a.media_id < b.media_id " +
        "WHERE bit_count(xor(a.vhash, b.vhash)) <= 6"),
    // cross-modal conjunction replayed in full from the pair-sigs dump:
    // brute-force Hamming over the dumped aHashes, exact 3-gram Jaccard
    // over the dumped captions, then the same ordered-pair equi-join
    "crossmodal_dup_pairs" ->
      ("WITH s AS (SELECT pair_id, ahash, caption FROM read_parquet('{OUT}/crossmodal_pair_sigs/*.parquet')), " +
        "img AS (SELECT a.pair_id AS a_id, b.pair_id AS b_id, " +
        "CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming " +
        "FROM s a JOIN s b ON a.pair_id < b.pair_id " +
        "WHERE bit_count(xor(a.ahash, b.ahash)) <= 6), " +
        "tok AS (SELECT pair_id, CASE WHEN len(trim(coalesce(caption,''))) = 0 THEN [] " +
        "ELSE string_split_regex(trim(coalesce(caption,'')), '\\s+') END AS toks FROM s), " +
        "g AS (SELECT pair_id, CASE WHEN len(toks) < 3 THEN [] " +
        "ELSE list_distinct(list_transform(generate_series(1, len(toks)-2), " +
        "i -> array_to_string(toks[i:i+2], ' '))) END AS grams FROM tok), " +
        "ex AS (SELECT pair_id, unnest(grams) AS gram FROM g WHERE len(grams) > 0), " +
        "inter AS (SELECT a.pair_id AS a_id, b.pair_id AS b_id, count(*) AS i " +
        "FROM ex a JOIN ex b ON a.gram = b.gram AND a.pair_id < b.pair_id GROUP BY 1, 2), " +
        "sz AS (SELECT pair_id, len(grams) AS ng FROM g WHERE len(grams) > 0), " +
        "cap AS (SELECT a_id, b_id, jaccard FROM (" +
        "SELECT inter.a_id, inter.b_id, " +
        "round(i::DOUBLE / (sa.ng + sb.ng - i), 4) AS jaccard " +
        "FROM inter JOIN sz sa ON inter.a_id = sa.pair_id " +
        "JOIN sz sb ON inter.b_id = sb.pair_id) WHERE jaccard >= 0.5) " +
        "SELECT img.a_id AS a_pair_id, img.b_id AS b_pair_id, img.hamming, cap.jaccard " +
        "FROM img JOIN cap ON img.a_id = cap.a_id AND img.b_id = cap.b_id"),
    // brute-force Hamming pairs over the SPARK-computed signatures (dumped
    // by the simhash_signatures entry; {OUT} → Verify's output dir): an
    // independent twin of the pigeonhole-chunk candidate join + verify
    "simhash_near_dup" ->
      ("WITH s AS (SELECT doc_id, sh FROM read_parquet('{OUT}/simhash_signatures/*.parquet')) " +
        "SELECT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id, " +
        "CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming " +
        "FROM s a JOIN s b ON a.doc_id < b.doc_id " +
        "WHERE bit_count(xor(a.sh, b.sh)) <= 3"),
    // DuckDB re-aggregates the Spark-dumped per-image features (the decode
    // is the seeded fake codec; the rollup semantics are what's checked).
    // avg over doubles is safe here: every mean_luma is an exact multiple
    // of 1/(w·h), partial sums stay far below 2^53/256 — summation is
    // exact in any order on both engines
    "media_image_features" ->
      ("WITH f AS (SELECT width, height, mean_luma, " +
        "CAST(string_split(luma_histogram, ',')[1] AS BIGINT) AS bucket0 " +
        "FROM read_parquet('{OUT}/media_image_features_dump/*.parquet')) " +
        "SELECT width, height, count(*) AS n_images, " +
        "round(avg(mean_luma) + 1e-9, 4) AS avg_luma, " +
        "CAST(sum(bucket0) AS BIGINT) AS bucket0_total " +
        "FROM f GROUP BY width, height ORDER BY width, height"),
    // audio twin of the media oracle: re-aggregate the dumped per-clip
    // features by amplitude bucket (floor(mean/8) exact in double)
    "media_audio_features" ->
      ("WITH f AS (SELECT * FROM read_parquet('{OUT}/media_audio_features_dump/*.parquet')) " +
        "SELECT amp_bucket, count(*) AS n_clips, " +
        "round(avg(mean_amplitude) + 1e-9, 4) AS avg_amplitude, " +
        "CAST(sum(zero_crossings) AS BIGINT) AS total_crossings " +
        "FROM (SELECT *, CAST(floor(mean_amplitude / 8) AS BIGINT) AS amp_bucket FROM f) " +
        "GROUP BY amp_bucket ORDER BY amp_bucket"),
    // video leg: replay the scene-cut window + per-video rollup from the
    // dumped per-frame features (mean_luma exact multiples of 1/64 — the
    // difference and >16.0 comparison are double-exact in both engines)
    "media_video_features" ->
      ("WITH f AS (SELECT * FROM read_parquet('{OUT}/media_video_features_dump/*.parquet')), " +
        "d AS (SELECT media_id, frame_idx, mean_luma, " +
        "lag(mean_luma) OVER (PARTITION BY media_id ORDER BY frame_idx) AS prev FROM f) " +
        "SELECT media_id, count(*) AS n_frames, " +
        "round(avg(mean_luma) + 1e-9, 4) AS avg_luma, " +
        "CAST(sum(CASE WHEN prev IS NOT NULL AND abs(mean_luma - prev) > 16.0 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_scene_cuts " +
        "FROM d GROUP BY media_id ORDER BY media_id"),
    // brute-force all-pairs twin of the banded-LSH plan: at the 0.8 threshold
    // with b=128,r=8 the LSH miss probability is ~7e-11, so exact match holds
    "near_dup_pairs" -> nearDupPairsSql,
    // the same pair set, source-joined and rolled up unordered; mean
    // jaccard from exact ten-thousandth sums, one final division r6
    "cross_source_dup_matrix" ->
      (s"WITH nd AS ($nearDupPairsSql), " +
        "s AS (SELECT doc_id, source FROM documents), " +
        "e AS (SELECT least(sa.source, sb.source) AS source_a, " +
        "greatest(sa.source, sb.source) AS source_b, " +
        "CAST(round(nd.jaccard * 10000) AS BIGINT) AS jm " +
        "FROM nd JOIN s sa ON nd.a_doc_id = sa.doc_id " +
        "JOIN s sb ON nd.b_doc_id = sb.doc_id) " +
        "SELECT source_a, source_b, count(*) AS n_pairs, " +
        "round(sum(jm)::DOUBLE / (count(*) * 10000)::DOUBLE, 6) AS avg_jaccard " +
        "FROM e GROUP BY 1, 2 ORDER BY 1, 2"),
    // inverted-index brute-force twin of the prefix-filtered exact join:
    // intersections from grouping the shared-gram join (only co-occurring
    // grams matter — J >= 0.5 needs at least one), sizes from the gram sets;
    // same trim/split tokenization + distinct space-joined 3-grams as the
    // Spark TokenNgramsExpr
    "token_jaccard_pairs" ->
      ("WITH tok AS (SELECT doc_id, CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
        "ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks FROM documents), " +
        "g AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN [] " +
        "ELSE list_distinct(list_transform(generate_series(1, len(toks)-2), " +
        "i -> array_to_string(toks[i:i+2], ' '))) END AS grams FROM tok), " +
        "ex AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE len(grams) > 0), " +
        "inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i " +
        "FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
        "sz AS (SELECT doc_id, len(grams) AS ng FROM g WHERE len(grams) > 0) " +
        "SELECT a_doc_id, b_doc_id, jaccard FROM (" +
        "SELECT a_id AS a_doc_id, b_id AS b_doc_id, " +
        "round(i::DOUBLE / (sa.ng + sb.ng - i), 4) AS jaccard " +
        "FROM inter JOIN sz sa ON inter.a_id = sa.doc_id " +
        "JOIN sz sb ON inter.b_id = sb.doc_id) WHERE jaccard >= 0.5"),
    // brute-force batch×corpus twin of the incremental (batch-vs-standing)
    // LSH join — same shingle sets, same threshold, same miss bound
    "incremental_near_dup" -> incrementalNearDupSql,
    "incremental_near_dup_indexed" -> incrementalNearDupSql,
    // the deleted-lifecycle probe must return exactly the never-appended
    // index's rows — same oracle (the junk docs' retraction is complete)
    "incremental_near_dup_deleted" -> incrementalNearDupSql,
    // first-tier-wins replay of the tiered probe: exact pairs by text
    // equality at jaccard 1.0 (the xxhash64 routing key is semantically
    // invisible — byte equality is the verified contract), then the same
    // brute-force shingle-jaccard tier restricted to batch docs with no
    // exact twin
    "tiered_incremental_dedup" ->
      ("WITH b0 AS (SELECT doc_id + 1000000 AS doc_id, " +
        "CASE WHEN doc_id % 20 = 0 THEN coalesce(text,'') || ' v2' " +
        "ELSE coalesce(text,'') END AS t FROM documents WHERE doc_id % 10 = 0), " +
        "c AS (SELECT doc_id, coalesce(text,'') AS t FROM documents " +
        "WHERE len(coalesce(text,'')) >= 5), " +
        "b AS (SELECT doc_id, t FROM b0 WHERE len(t) >= 5), " +
        "exact AS (SELECT b.doc_id AS new_doc_id, c.doc_id AS dup_of_doc_id, " +
        "CAST(1.0 AS DOUBLE) AS jaccard FROM b JOIN c ON b.t = c.t), " +
        "shc AS (SELECT doc_id, list_distinct(list_transform(" +
        "generate_series(1, greatest(len(t)-4, 0)), i -> t[i:i+4])) AS s FROM c), " +
        "shb AS (SELECT doc_id, list_distinct(list_transform(" +
        "generate_series(1, greatest(len(t)-4, 0)), i -> t[i:i+4])) AS s FROM b " +
        "WHERE doc_id NOT IN (SELECT new_doc_id FROM exact)), " +
        "near AS (SELECT new_doc_id, dup_of_doc_id, jaccard FROM (" +
        "SELECT a.doc_id AS dup_of_doc_id, x.doc_id AS new_doc_id, " +
        "round(len(list_intersect(a.s, x.s))::DOUBLE / len(list_distinct(list_concat(a.s, x.s))), 4) AS jaccard " +
        "FROM shc a JOIN shb x ON len(a.s) > 0 AND len(x.s) > 0) " +
        "WHERE jaccard >= 0.8) " +
        "SELECT new_doc_id, dup_of_doc_id, jaccard FROM exact " +
        "UNION ALL SELECT new_doc_id, dup_of_doc_id, jaccard FROM near " +
        "ORDER BY new_doc_id, dup_of_doc_id"),
    // the Bloom pre-filter is semantically invisible (no false negatives;
    // false positives are removed by the exact verify), so the oracle is
    // the PLAIN anti-join over the same derived re-crawl batch
    "bloom_incremental_dedup" ->
      ("WITH b AS (SELECT doc_id + 1000000 AS doc_id, " +
        "CASE WHEN doc_id % 20 = 0 THEN coalesce(text,'') || ' v2' " +
        "ELSE text END AS text FROM documents WHERE doc_id % 10 = 0) " +
        "SELECT b.doc_id AS new_doc_id, sha256(coalesce(b.text,'')) AS text_hash " +
        "FROM b WHERE sha256(coalesce(b.text,'')) NOT IN " +
        "(SELECT sha256(coalesce(text,'')) FROM documents)"),
    // brute-force distinct-token-8-gram intersection twin of the broadcast
    // decontamination sweep (same whitespace tokenization as text_stats)
    "ngram_contamination" -> ngramContaminationSql,
    // min-reachable-label per node over the symmetrized pair graph — an
    // independent (recursive-CTE) implementation of the same connected
    // components the Spark side computes by iterative label propagation
    "near_dup_clusters" ->
      (s"WITH RECURSIVE nd AS ($nearDupPairsSql), " +
        "sym AS (SELECT a_doc_id AS src, b_doc_id AS dst FROM nd " +
        "UNION ALL SELECT b_doc_id, a_doc_id FROM nd), " +
        "reach(node, label) AS (" +
        "SELECT DISTINCT src, src FROM sym " +
        "UNION " +
        "SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.node) " +
        "SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node"),
    "near_dedup_corpus" ->
      (s"WITH k AS ($exactDedupSql), nd AS ($nearDupPairsSql) " +
        "SELECT d.doc_id, d.lang, d.n_chars FROM documents d " +
        "JOIN k ON d.doc_id = k.keep_doc_id " +
        "WHERE d.doc_id NOT IN (SELECT b_doc_id FROM nd)"),
    // dedup chain ∖ benchmark slice ∖ decontamination hits — the composed
    // corpus build, from the same shared subquery twins
    "decontaminated_corpus" ->
      (s"WITH k AS ($exactDedupSql), nd AS ($nearDupPairsSql), " +
        s"ct AS ($ngramContaminationSql) " +
        "SELECT d.doc_id, d.lang, d.n_chars FROM documents d " +
        "JOIN k ON d.doc_id = k.keep_doc_id " +
        "WHERE d.doc_id NOT IN (SELECT b_doc_id FROM nd) " +
        "AND d.doc_id % 10 <> 0 " +
        "AND d.doc_id NOT IN (SELECT doc_id FROM ct)"),
    // the ingest-day chain, from the same brute-force component twins with
    // the pair spaces restricted to today's batch
    "ingested_corpus" -> ingestedCorpusSql,
    // the decision table from the SAME shared component twins, decided in
    // the same priority order the release chains apply
    "doc_curation_decisions" ->
      (s"WITH k AS ($exactDedupSql), nd AS ($nearDupPairsSql), " +
        s"ct AS ($ngramContaminationSql), st AS ($textStatsSql) " +
        "SELECT d.doc_id, st.quality_score, " +
        "CASE WHEN d.doc_id NOT IN (SELECT keep_doc_id FROM k) THEN 'drop_exact_dup' " +
        "WHEN d.doc_id IN (SELECT b_doc_id FROM nd) THEN 'drop_near_dup' " +
        "WHEN d.doc_id IN (SELECT doc_id FROM ct) THEN 'drop_contaminated' " +
        "WHEN st.quality_score < 0.45 THEN 'review_low_quality' " +
        "ELSE 'keep' END AS verdict " +
        "FROM documents d JOIN st ON d.doc_id = st.doc_id WHERE d.doc_id % 10 <> 0"),
    // brute-force twin of the sign-LSH plan: at threshold 0.4 with r=2,b=64
    // the LSH miss probability is ~7e-15, so exact match holds (seeded planes)
    "embedding_near_dup" -> embeddingNearDupSql,
    // min-reachable-label over the symmetrized cosine pair graph — same
    // recursive-CTE construction as near_dup_clusters, embedding tier
    "embedding_dup_clusters" ->
      (s"WITH RECURSIVE nd AS ($embeddingNearDupSql), " +
        "sym AS (SELECT a_vec_id AS src, b_vec_id AS dst FROM nd " +
        "UNION ALL SELECT b_vec_id, a_vec_id FROM nd), " +
        "reach(node, label) AS (" +
        "SELECT DISTINCT src, src FROM sym " +
        "UNION " +
        "SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.node) " +
        "SELECT node AS vec_id, min(label) AS cluster_id FROM reach GROUP BY node"),
    // SemDeDup replayed from the standing fit's assignment dump: in-cell
    // pairs only, same rounded cosine, same keep-lowest-id drop rule
    "semdedup_pruned" ->
      ("WITH a AS (SELECT vec_id, cell FROM read_parquet('{OUT}/ivf_assignments/*.parquet')), " +
        "e AS (SELECT a.vec_id, a.cell, emb.embedding FROM a " +
        "JOIN embeddings emb USING (vec_id)), " +
        "dr AS (SELECT DISTINCT r.vec_id FROM e l JOIN e r " +
        "ON l.cell = r.cell AND l.vec_id < r.vec_id " +
        "WHERE round(list_cosine_similarity(l.embedding::DOUBLE[], r.embedding::DOUBLE[]), 6) >= 0.3) " +
        "SELECT e.vec_id, e.cell, CASE WHEN dr.vec_id IS NULL THEN 1 ELSE 0 END AS is_kept " +
        "FROM e LEFT JOIN dr ON e.vec_id = dr.vec_id"),
    // prototype pruning replayed from the assignment + centroid dumps:
    // cosine-to-own-centroid (same float values — the dump is float-cast),
    // per-cell rank (rounded cosine desc, vec_id tiebreak), integer quota
    "prototype_pruned" ->
      (s"WITH $protoScoredCtes " +
        "SELECT vec_id, cell, proto_cos, CASE WHEN rnk <= (cell_n * 1) // 4 " +
        "THEN 0 ELSE 1 END AS is_kept FROM r"),
    // retrain-on-drift health evidence: reconstruct the drifted corpus
    // from the embeddings table (even = raw, odd = reversed), score every
    // vector against its dumped phase/cell centroid, roll up per phase and
    // cell in exact integer micros — the pre rows replay the frozen-center
    // drift injury, the post rows the refit cure
    "ivf_retrain_health" ->
      ("WITH a AS (SELECT phase, vec_id, cell FROM read_parquet('{OUT}/ivf_retrain_assignments/*.parquet')), " +
        "c AS (SELECT phase, cell, list_transform(string_split(centroid, ','), x -> CAST(x AS DOUBLE)) AS centroid " +
        "FROM read_parquet('{OUT}/ivf_retrain_centroids/*.parquet')), " +
        "v AS (SELECT vec_id, CASE WHEN vec_id % 2 = 0 THEN embedding ELSE list_reverse(embedding) END AS embedding " +
        "FROM embeddings), " +
        "e AS (SELECT a.phase, a.cell, " +
        "round(list_cosine_similarity(v.embedding::DOUBLE[], c.centroid), 6) AS proto_cos " +
        "FROM a JOIN v USING (vec_id) JOIN c ON c.phase = a.phase AND c.cell = a.cell) " +
        "SELECT phase, cell, n_vecs, sum_cos_micros, sum_cos_micros // n_vecs AS mean_cos_micros " +
        "FROM (SELECT phase, cell, CAST(count(*) AS BIGINT) AS n_vecs, " +
        "CAST(sum(CAST(round(proto_cos * 1000000) AS BIGINT)) AS BIGINT) AS sum_cos_micros " +
        "FROM e GROUP BY phase, cell)"),
    // weighted per-phase rollup of the retrain-health replay; alarm is a
    // strict `<` against the post phase's own mean via a scalar subquery
    "ivf_drift_alarm" ->
      ("WITH a AS (SELECT phase, vec_id, cell FROM read_parquet('{OUT}/ivf_retrain_assignments/*.parquet')), " +
        "c AS (SELECT phase, cell, list_transform(string_split(centroid, ','), x -> CAST(x AS DOUBLE)) AS centroid " +
        "FROM read_parquet('{OUT}/ivf_retrain_centroids/*.parquet')), " +
        "v AS (SELECT vec_id, CASE WHEN vec_id % 2 = 0 THEN embedding ELSE list_reverse(embedding) END AS embedding " +
        "FROM embeddings), " +
        "e AS (SELECT a.phase, " +
        "round(list_cosine_similarity(v.embedding::DOUBLE[], c.centroid), 6) AS proto_cos " +
        "FROM a JOIN v USING (vec_id) JOIN c ON c.phase = a.phase AND c.cell = a.cell), " +
        "r AS (SELECT phase, CAST(count(*) AS BIGINT) AS total_vecs, " +
        "CAST(sum(CAST(round(proto_cos * 1000000) AS BIGINT)) AS BIGINT) // CAST(count(*) AS BIGINT) AS weighted_mean_micros " +
        "FROM e GROUP BY phase) " +
        "SELECT phase, total_vecs, weighted_mean_micros, " +
        "weighted_mean_micros < (SELECT weighted_mean_micros FROM r WHERE phase = 'post') AS alarm " +
        "FROM r ORDER BY phase"),
    // per-cell md5 ranking replayed from the assignments dump — both
    // engines hash the decimal vec_id string to the same lowercase hex
    "cluster_balanced_sample" ->
      ("WITH a AS (SELECT vec_id, cell FROM read_parquet('{OUT}/ivf_assignments/*.parquet')) " +
        "SELECT cell, rk, vec_id FROM (" +
        "SELECT cell, vec_id, CAST(row_number() OVER (PARTITION BY cell " +
        "ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS rk FROM a) " +
        "WHERE rk <= 40"),
    // per-cell rollup of the same scored frame: micro-quantized cosine
    // sums and truncating integer mean (DuckDB // and Spark DIV both
    // truncate toward zero)
    "ivf_quantization_error" ->
      (s"WITH $protoScoredCtes " +
        "SELECT cell, n_vecs, sum_cos_micros, sum_cos_micros // n_vecs AS mean_cos_micros " +
        "FROM (SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs, " +
        "CAST(sum(CAST(round(proto_cos * 1000000) AS BIGINT)) AS BIGINT) AS sum_cos_micros " +
        "FROM e GROUP BY cell)"),
    // D4: the semdedup drop set carved out first, prototype rank + quota
    // over the SURVIVORS only, both stage decisions in the output
    "d4_pruned" ->
      ("WITH a AS (SELECT vec_id, cell FROM read_parquet('{OUT}/ivf_assignments/*.parquet')), " +
        "c AS (SELECT cell, list_transform(string_split(centroid, ','), x -> CAST(x AS DOUBLE)) AS centroid " +
        "FROM read_parquet('{OUT}/proto_centroids/*.parquet')), " +
        "e AS (SELECT a.vec_id, a.cell, emb.embedding FROM a " +
        "JOIN embeddings emb USING (vec_id)), " +
        "dr AS (SELECT DISTINCT r.vec_id FROM e l JOIN e r " +
        "ON l.cell = r.cell AND l.vec_id < r.vec_id " +
        "WHERE round(list_cosine_similarity(l.embedding::DOUBLE[], r.embedding::DOUBLE[]), 6) >= 0.3), " +
        "f AS (SELECT e.vec_id, e.cell, e.embedding, " +
        "CASE WHEN dr.vec_id IS NULL THEN 1 ELSE 0 END AS semdedup_kept " +
        "FROM e LEFT JOIN dr ON e.vec_id = dr.vec_id), " +
        "r AS (SELECT f.vec_id, " +
        "row_number() OVER (PARTITION BY f.cell ORDER BY " +
        "round(list_cosine_similarity(f.embedding::DOUBLE[], c.centroid), 6) DESC, f.vec_id) AS rnk, " +
        "count(*) OVER (PARTITION BY f.cell) AS cell_n " +
        "FROM f JOIN c USING (cell) WHERE f.semdedup_kept = 1) " +
        "SELECT f.vec_id, f.cell, f.semdedup_kept, " +
        "CASE WHEN f.semdedup_kept = 0 THEN 0 " +
        "WHEN r.rnk <= (r.cell_n * 1) // 4 THEN 0 ELSE 1 END AS is_kept " +
        "FROM f LEFT JOIN r ON f.vec_id = r.vec_id"),
    // brute-force batch×corpus twin of the persisted-index probe — the
    // index is an execution layout, not a semantic (miss p ≈ 7e-15 at the
    // r=2/b=64 test geometry, so exact match holds)
    "incremental_embedding_near_dup" ->
      ("SELECT b.vec_id AS new_vec_id, a.vec_id AS dup_of_vec_id, " +
        "round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine " +
        "FROM embeddings a JOIN embeddings b " +
        "ON a.vec_id % 10 <> 0 AND b.vec_id % 10 = 0 " +
        "WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4"),
    // IVF ranking replayed from the Spark-dumped cell assignments + probed
    // cells ({OUT} mechanism, the pq_adc_topk pattern): DuckDB joins each
    // query's probed cells to the assignment table — reproducing the pruned
    // scan — then exact-rescores just those vectors from the raw embeddings
    // table and ranks (cosine rounded 6 dp, vec_id tiebreak). The ANN
    // approximation lives in the dumps; what's checked is that the pruned
    // scan, scoring, and ranking are computed correctly from them.
    // K-Means itself has no DuckDB twin; the dumped assignments capture the
    // model's output and the rollup arithmetic is what's checked (the same
    // contract as ivf_assignments → ivf_topk)
    "kmeans_cluster_sizes" ->
      ("SELECT prediction, count(*) AS n_docs " +
        "FROM read_parquet('{OUT}/kmeans_assignments/*.parquet') GROUP BY prediction"),
    // distilled quality classifier: the optimizer's landing spot lives in
    // the coefs dump; what's checked is the scoring arithmetic — DuckDB
    // rebuilds the margin from the dumped features and coefficients with
    // the IDENTICAL left-to-right literal chain (IEEE doubles in the same
    // order are bit-equal), then the same rounding/threshold
    "quality_classifier_scores" ->
      ("WITH c AS (SELECT * FROM read_parquet('{OUT}/quality_model_coefs/*.parquet')), " +
        "s AS (SELECT doc_id, f_len, f_stop, f_punct, f_digit, f_wordlen, weak_label " +
        "FROM read_parquet('{OUT}/quality_classifier_scores/*.parquet')), " +
        "m AS (SELECT s.*, " +
        "(SELECT coef FROM c WHERE feature = '__intercept') + " +
        "(SELECT coef FROM c WHERE feature = 'f_len') * f_len + " +
        "(SELECT coef FROM c WHERE feature = 'f_stop') * f_stop + " +
        "(SELECT coef FROM c WHERE feature = 'f_punct') * f_punct + " +
        "(SELECT coef FROM c WHERE feature = 'f_digit') * f_digit + " +
        "(SELECT coef FROM c WHERE feature = 'f_wordlen') * f_wordlen AS raw_margin " +
        "FROM s) " +
        "SELECT doc_id, f_len, f_stop, f_punct, f_digit, f_wordlen, weak_label, " +
        "round(raw_margin + 1e-9, 6) AS margin, " +
        "CAST(raw_margin > 0.0 AS INTEGER) AS predicted FROM m"),
    // confusion rollup re-aggregated from the scores dump; margins travel
    // as exact integer micros so the sum is order-independent
    "quality_classifier_eval" ->
      ("SELECT weak_label, predicted, count(*) AS n_docs, " +
        "CAST(sum(CAST(round(margin * 1e6) AS BIGINT)) AS BIGINT) AS sum_margin_micros " +
        "FROM read_parquet('{OUT}/quality_classifier_scores/*.parquet') " +
        "GROUP BY weak_label, predicted ORDER BY weak_label, predicted"),
    "ivf_topk" -> ivfReplaySql,
    // the SQL-surface twin: same plan, same oracle
    "ivf_topk_sql" -> ivfReplaySql,
    // same rows by construction: the persisted standing index is the SAME
    // fit as the in-memory one (Similarity.ensureFixtureIndex persists it),
    // so the amortized probe replays identically
    "ivf_probe_only" -> ivfReplaySql,
    // the persist-cycle entry probes the standing fit too (r10) — its
    // output replays from the same dumps; what it uniquely measures is the
    // on-disk construction time, which the oracle need not see
    "ivf_topk_persisted" -> ivfReplaySql,
    // append∘delete∘absorb is the identity on the index's semantics: the
    // retraction entry probes the standing fit after the junk slice is
    // tombstoned and physically absorbed, so it replays from the same dumps
    "ivf_topk_deleted" -> ivfReplaySql,
    // same replay pipeline, cells chosen by the two-level coarse tier —
    // the choice itself is the dump; the pipeline over it is hash-checked
    "ivf_topk_coarse" -> ivfReplaySqlOver("ivf_coarse_probe_cells"),
    // the tuning curve: every nprobe width's probe set is the ranked dump
    // sliced at rk <= nprobe; exact baseline = the cosine_topk
    // construction; candidates rescored exactly and ranked per width
    "ivf_recall_curve" ->
      ("WITH a AS (SELECT vec_id, cell FROM read_parquet('{OUT}/ivf_assignments/*.parquet')), " +
        "p AS (SELECT query_id, cell, rk FROM read_parquet('{OUT}/ivf_probe_cells/*.parquet')), " +
        "np AS (SELECT CAST(unnest([1, 2, 4, 8, 16]) AS BIGINT) AS nprobe), " +
        "q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5), " +
        "f AS (SELECT query_id, vec_id FROM (" +
        "SELECT q.query_id, e.vec_id, row_number() OVER (PARTITION BY q.query_id " +
        "ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id) AS rk " +
        "FROM embeddings e, q WHERE e.vec_id <> q.query_id) WHERE rk <= 10), " +
        "s AS (SELECT np.nprobe, p.query_id, a.vec_id, " +
        "round(list_cosine_similarity(e.embedding::DOUBLE[], qe.embedding::DOUBLE[]), 6) AS cosine " +
        "FROM np JOIN p ON p.rk <= np.nprobe JOIN a ON a.cell = p.cell " +
        "JOIN embeddings e ON e.vec_id = a.vec_id " +
        "JOIN embeddings qe ON qe.vec_id = p.query_id " +
        "WHERE a.vec_id <> p.query_id), " +
        "t AS (SELECT nprobe, query_id, vec_id FROM (" +
        "SELECT nprobe, query_id, vec_id, row_number() OVER (PARTITION BY nprobe, query_id " +
        "ORDER BY cosine DESC, vec_id) AS rk2 FROM s) WHERE rk2 <= 10) " +
        "SELECT t.nprobe, t.query_id, count(f.vec_id) AS n_overlap, " +
        "round(count(f.vec_id)::DOUBLE / 10, 4) AS recall " +
        "FROM t LEFT JOIN f ON t.query_id = f.query_id AND t.vec_id = f.vec_id " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    // the IVF×PQ composition replayed end-to-end from the four dumps
    // (one shared definition — see ivfPqTopkSql)
    "ivf_pq_topk" -> ivfPqTopkSql,
    // the residual composition replayed from its own two dumps + the
    // shared assignment/probe dumps — the per-(query, cell) dtab join is
    // the IVFADC semantics under test
    "ivf_pq_residual_topk" -> ivfPqResidualTopkSql,
    // layout change, not semantic: the persisted cell-partitioned
    // residual layout probed with loaded centers/codebooks returns
    // ivf_pq_residual_topk's rows
    "ivf_pq_residual_topk_indexed" -> ivfPqResidualTopkSql,
    // the residual distortion rollup replayed end-to-end: residual =
    // embedding − center(cell) (exact double arithmetic both sides), then
    // the pq_quant_error replay shape against the RESIDUAL codebooks
    "pq_residual_quant_error" ->
      ("WITH ctr AS (SELECT cell, list_transform(string_split(center, ','), x -> CAST(x AS DOUBLE)) AS ctr " +
        "FROM read_parquet('{OUT}/ivf_centers/*.parquet')), " +
        "a AS (SELECT vec_id, cell FROM read_parquet('{OUT}/ivf_assignments/*.parquet')), " +
        "c AS (SELECT vec_id, list_transform(string_split(codes, ','), x -> CAST(x AS INTEGER)) AS codes " +
        "FROM read_parquet('{OUT}/pq_residual_codes/*.parquet')), " +
        "cb AS (SELECT subspace, codeword, " +
        "list_transform(string_split(center, ','), x -> CAST(x AS DOUBLE)) AS w " +
        "FROM read_parquet('{OUT}/pq_residual_codebooks/*.parquet')), " +
        "e AS (SELECT c.vec_id, cb.subspace, " +
        "round(list_sum(list_transform(generate_series(1, 8), " +
        "j -> ((emb.embedding[cb.subspace * 8 + j]::DOUBLE - ctr.ctr[cb.subspace * 8 + j]) - cb.w[j]) * " +
        "((emb.embedding[cb.subspace * 8 + j]::DOUBLE - ctr.ctr[cb.subspace * 8 + j]) - cb.w[j]))), 6) AS err " +
        "FROM c JOIN embeddings emb USING (vec_id) " +
        "JOIN a USING (vec_id) JOIN ctr ON ctr.cell = a.cell " +
        "JOIN cb ON cb.codeword = c.codes[cb.subspace + 1]) " +
        "SELECT subspace, n_vecs, sum_err_micros, " +
        "sum_err_micros // n_vecs AS mean_err_micros " +
        "FROM (SELECT subspace, CAST(count(*) AS BIGINT) AS n_vecs, " +
        "CAST(sum(CAST(round(err * 1000000) AS BIGINT)) AS BIGINT) AS sum_err_micros " +
        "FROM e GROUP BY subspace) ORDER BY subspace"),
    // both approximate legs re-ranked from their dumps, the exact leg
    // recomputed from the embeddings table (the sq_rerank exact-L2 replay
    // shape), then the recall rollup — small-integer counts, r4 ratios
    "pq_residual_recall" ->
      (s"WITH $pqDumpCtes, $ivfCompDumpCtes, $pqResidualScoredCte, " +
        "s AS (SELECT p.query_id, c.vec_id, " +
        "round(list_sum(list_transform(generate_series(1, 8), " +
        "m -> q.dtab[(m-1)*64 + c.codes[m] + 1])), 6) AS adc " +
        "FROM p JOIN a ON a.cell = p.cell " +
        "JOIN c ON c.vec_id = a.vec_id " +
        "JOIN q ON q.query_id = p.query_id " +
        "WHERE c.vec_id <> p.query_id), " +
        "traw AS (SELECT query_id, vec_id FROM (" +
        "SELECT query_id, vec_id, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY adc, vec_id) AS rk FROM s) WHERE rk <= 10), " +
        "tres AS (SELECT query_id, vec_id FROM (" +
        "SELECT query_id, vec_id, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY adc, vec_id) AS rk FROM rs) WHERE rk <= 10), " +
        "qq AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5), " +
        "x AS (SELECT qq.query_id, e.vec_id, " +
        "round(list_sum(list_transform(generate_series(1, 64), " +
        "i -> (e.embedding[i]::DOUBLE - qq.q_emb[i]::DOUBLE) * " +
        "(e.embedding[i]::DOUBLE - qq.q_emb[i]::DOUBLE))), 6) AS l2sq " +
        "FROM embeddings e, qq WHERE e.vec_id <> qq.query_id), " +
        "f AS (SELECT query_id, vec_id FROM (" +
        "SELECT query_id, vec_id, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY l2sq, vec_id) AS rk FROM x) WHERE rk <= 10), " +
        "u AS (SELECT 'ivf_pq' AS variant, query_id, vec_id FROM traw " +
        "UNION ALL SELECT 'ivf_pq_residual' AS variant, query_id, vec_id FROM tres) " +
        "SELECT u.variant, u.query_id, count(f.vec_id) AS n_overlap, " +
        "round(count(f.vec_id)::DOUBLE / 10, 4) AS recall " +
        "FROM u LEFT JOIN f ON u.query_id = f.query_id AND u.vec_id = f.vec_id " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    // layout + serving-fold change, not semantic: the persisted composed
    // index probed through the cell-aware fold returns ivf_pq_topk's rows
    "ivf_pq_topk_indexed" -> ivfPqTopkSql,
    // layout-maintenance change, not semantic: append-fragmented cells
    // compacted to one file each still return ivf_pq_topk's rows
    "ivf_pq_topk_compacted" -> ivfPqTopkSql,
    // the composed replay with the TWO-LEVEL probe dump as the cell set:
    // same assignment prune + ADC arithmetic, cells chosen through the
    // persisted coarse quantizer (ivf_coarse_probe_cells' geometry)
    "ivf_pq_topk_coarse" -> ivfPqTopkSqlOver("ivf_coarse_probe_cells"),
    // identical integer-rational BM25: the only libm call (ln) quantizes
    // to micros per term; every per-(doc,term) weight is the same double
    // dag over exact integers, summed as BIGINT
    "bm25_topk" -> bm25Sql,
    // layout change, not semantic: the standing segment layout probed
    // through the bucket-pruned scan returns bm25_topk's rows
    "bm25_topk_indexed" -> bm25Sql,
    // layout-maintenance change, not semantic: segment-fragmented term
    // buckets compacted to one file each still return bm25_topk's rows
    "bm25_topk_compacted" -> bm25Sql,
    // append∘delete∘absorb is the identity: tombstone anti-join + the
    // (N, Σdl) correction + the absorbing rewrite return the batch rows
    "bm25_topk_deleted" -> bm25Sql,
    // RRF fusion of the two component rankings, each contribution
    // micro-quantized from the same integer division — sums exact
    "hybrid_rrf_topk" ->
      (s"WITH lx AS ($bm25Sql), " +
        "cq AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 3), " +
        "cs AS (SELECT cq.query_id, e.vec_id, " +
        "round(list_cosine_similarity(e.embedding::DOUBLE[], cq.q_emb::DOUBLE[]), 6) AS cosine " +
        "FROM embeddings e, cq WHERE e.vec_id <> cq.query_id), " +
        "ct AS (SELECT query_id, vec_id AS doc_id, rk FROM (" +
        "SELECT query_id, vec_id, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM cs) WHERE rk <= 10), " +
        "u AS (SELECT query_id, doc_id, CAST(round(1000000.0 / (60 + rk)) AS BIGINT) AS c FROM lx " +
        "UNION ALL SELECT query_id, doc_id, CAST(round(1000000.0 / (60 + rk)) AS BIGINT) AS c FROM ct), " +
        "g AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_micros, " +
        "count(*) AS n_lists FROM u GROUP BY 1, 2) " +
        "SELECT query_id, CAST(rk AS BIGINT) AS rk, doc_id, rrf_micros, n_lists FROM (" +
        "SELECT query_id, doc_id, rrf_micros, n_lists, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY rrf_micros DESC, doc_id) AS rk FROM g) " +
        "WHERE rk <= 10 ORDER BY query_id, rk"),
    // cosine_topk's construction restricted to OTHER-label candidates,
    // plus the negative's label payload
    "hard_negatives" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb, label AS q_label " +
        "FROM embeddings WHERE vec_id < 5), " +
        "s AS (SELECT q.query_id, e.vec_id, " +
        "round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) AS cosine " +
        "FROM embeddings e, q WHERE e.vec_id <> q.query_id AND e.label <> q.q_label), " +
        "topk AS (SELECT query_id, vec_id, cosine, rk FROM (" +
        "SELECT query_id, vec_id, cosine, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM s) " +
        "WHERE rk <= 10) " +
        "SELECT t.query_id, CAST(t.rk AS BIGINT) AS rk, t.vec_id, t.cosine, " +
        "e.label AS neg_label FROM topk t JOIN embeddings e USING (vec_id) " +
        "ORDER BY t.query_id, t.rk"),
    "cosine_topk" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5), " +
        "s AS (SELECT q.query_id, e.vec_id, " +
        "round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) AS cosine " +
        "FROM embeddings e, q WHERE e.vec_id <> q.query_id) " +
        "SELECT query_id, vec_id, cosine, rk FROM (" +
        "SELECT query_id, vec_id, cosine, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM s) " +
        "WHERE rk <= 10"),
    // matryoshka truncation eval: both rankings replayed — the full-dim
    // top-10 (the cosine_topk construction) and, per dim, the
    // prefix-sliced ranking via list_slice; recall is a small-integer
    // ratio, cosine r6-rounded with vec_id tiebreak exactly as cosine_topk
    "matryoshka_recall" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5), " +
        "f AS (SELECT query_id, vec_id FROM (" +
        "SELECT q.query_id, e.vec_id, row_number() OVER (PARTITION BY q.query_id " +
        "ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id) AS rk " +
        "FROM embeddings e, q WHERE e.vec_id <> q.query_id) WHERE rk <= 10), " +
        "ds AS (SELECT CAST(unnest([8, 16, 32]) AS BIGINT) AS dim), " +
        "t AS (SELECT dim, query_id, vec_id FROM (" +
        "SELECT ds.dim, q.query_id, e.vec_id, row_number() OVER (PARTITION BY ds.dim, q.query_id " +
        "ORDER BY round(list_cosine_similarity(" +
        "list_slice(e.embedding::DOUBLE[], 1, CAST(ds.dim AS INT)), " +
        "list_slice(q.q_emb::DOUBLE[], 1, CAST(ds.dim AS INT))), 6) DESC, e.vec_id) AS rk " +
        "FROM embeddings e, q, ds WHERE e.vec_id <> q.query_id) WHERE rk <= 10) " +
        "SELECT t.dim, t.query_id, count(f.vec_id) AS n_overlap, " +
        "round(count(f.vec_id)::DOUBLE / 10, 4) AS recall " +
        "FROM t LEFT JOIN f ON t.query_id = f.query_id AND t.vec_id = f.vec_id " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    // document-fetch retrieval: the cosine_topk construction joined to the
    // documents payload (1-based substr agrees between engines)
    "semantic_search_docs" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5), " +
        "s AS (SELECT q.query_id, e.vec_id, " +
        "round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) AS cosine " +
        "FROM embeddings e, q WHERE e.vec_id <> q.query_id), " +
        "topk AS (SELECT query_id, vec_id, cosine, rk FROM (" +
        "SELECT query_id, vec_id, cosine, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM s) " +
        "WHERE rk <= 10) " +
        "SELECT t.query_id, CAST(t.rk AS BIGINT) AS rk, d.doc_id, t.cosine, " +
        "d.lang, substr(d.text, 1, 40) AS snippet " +
        "FROM topk t JOIN documents d ON d.doc_id = t.vec_id " +
        "ORDER BY t.query_id, t.rk"),
    // label precision@10 over the same exact ranking: joins + arithmetic
    // on top of the cosine_topk construction
    "retrieval_label_precision" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5), " +
        "s AS (SELECT q.query_id, e.vec_id, " +
        "round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) AS cosine " +
        "FROM embeddings e, q WHERE e.vec_id <> q.query_id), " +
        "topk AS (SELECT query_id, vec_id FROM (" +
        "SELECT query_id, vec_id, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM s) " +
        "WHERE rk <= 10), " +
        "p AS (SELECT t.query_id, " +
        "CAST(sum(CASE WHEN e2.label = e1.label THEN 1 ELSE 0 END) AS BIGINT) AS n_same_label " +
        "FROM topk t JOIN embeddings e1 ON e1.vec_id = t.query_id " +
        "JOIN embeddings e2 ON e2.vec_id = t.vec_id GROUP BY t.query_id) " +
        "SELECT query_id, n_same_label, round(n_same_label::DOUBLE / 10, 4) AS precision " +
        "FROM p ORDER BY query_id"),
    // ADC ranking recomputed from the Spark-dumped PQ codes + per-query
    // distance tables ({OUT} mechanism): adc = sum over subspaces m of
    // dtab[m*64 + codes[m]] in subspace order (list order = Spark's sum
    // order), rounded 6 dp, vec_id tiebreak — geometry 8 subspaces × 64
    // codewords, matching Pq.NumSubspaces/CodebookSize
    "pq_adc_topk" ->
      (s"WITH $pqAdcCtes " +
        "SELECT query_id, vec_id, adc, rk FROM (" +
        "SELECT query_id, vec_id, adc, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS rk FROM s) " +
        "WHERE rk <= 10"),
    // reconstruction error replayed from the codes + codebooks dumps and
    // the raw embeddings: per-subspace slice, squared L2 to the assigned
    // codeword (left-to-right double sum), micro-quantized integer rollup
    "pq_quant_error" ->
      ("WITH c AS (SELECT vec_id, list_transform(string_split(codes, ','), x -> CAST(x AS INTEGER)) AS codes " +
        "FROM read_parquet('{OUT}/pq_codes/*.parquet')), " +
        "cb AS (SELECT subspace, codeword, " +
        "list_transform(string_split(center, ','), x -> CAST(x AS DOUBLE)) AS w " +
        "FROM read_parquet('{OUT}/pq_codebooks/*.parquet')), " +
        "e AS (SELECT c.vec_id, cb.subspace, " +
        "round(list_sum(list_transform(generate_series(1, 8), " +
        "j -> (emb.embedding[cb.subspace * 8 + j]::DOUBLE - cb.w[j]) * " +
        "(emb.embedding[cb.subspace * 8 + j]::DOUBLE - cb.w[j]))), 6) AS err " +
        "FROM c JOIN embeddings emb USING (vec_id) " +
        "JOIN cb ON cb.codeword = c.codes[cb.subspace + 1]) " +
        "SELECT subspace, n_vecs, sum_err_micros, " +
        "sum_err_micros // n_vecs AS mean_err_micros " +
        "FROM (SELECT subspace, CAST(count(*) AS BIGINT) AS n_vecs, " +
        "CAST(sum(CAST(round(err * 1000000) AS BIGINT)) AS BIGINT) AS sum_err_micros " +
        "FROM e GROUP BY subspace) ORDER BY subspace"),
    // layout change, not semantic: the persisted-index probe returns the
    // same rows as the in-memory ADC ranking
    "pq_adc_topk_indexed" ->
      (s"WITH $pqAdcCtes " +
        "SELECT query_id, vec_id, adc, rk FROM (" +
        "SELECT query_id, vec_id, adc, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS rk FROM s) " +
        "WHERE rk <= 10"),
    // shortlist (rounded-ADC rank <= 50 from the dumps) then EXACT rerank:
    // squared L2 recomputed from the raw embeddings table, left-to-right
    // double sum = Spark's fused loop, rounded 6 dp, vec_id tiebreak
    // integer-exact compressed ranking from the codes dump (qdist BIGINT)
    "sq_adc_topk" ->
      (s"WITH $sqAdcCtes " +
        "SELECT query_id, vec_id, qdist, rk FROM (" +
        "SELECT query_id, vec_id, qdist, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY qdist, vec_id) AS rk FROM s) " +
        "WHERE rk <= 10"),
    // layout change, not semantic: the persisted-index probe returns the
    // same rows as the in-memory integer-L2 ranking
    "sq_adc_topk_indexed" ->
      (s"WITH $sqAdcCtes " +
        "SELECT query_id, vec_id, qdist, rk FROM (" +
        "SELECT query_id, vec_id, qdist, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY qdist, vec_id) AS rk FROM s) " +
        "WHERE rk <= 10"),
    // grid reconstruction error replayed from the codes + params dumps
    // against the raw embeddings: decode = min + code/scale (a constant
    // dim decodes to its min), squared residual rounded 6 dp,
    // micro-quantized integer rollup, truncating mean — the identical
    // double dag as Sq.reconErr + Cols.micros6
    "sq_quant_error" ->
      ("WITH c AS (SELECT vec_id, list_transform(string_split(codes, ','), x -> CAST(x AS INTEGER)) AS codes " +
        "FROM read_parquet('{OUT}/sq_codes/*.parquet')), " +
        "p AS (SELECT dim, min_val, scale FROM read_parquet('{OUT}/sq_params/*.parquet')), " +
        "e0 AS (SELECT c.vec_id, p.dim, emb.embedding[p.dim + 1]::DOUBLE - " +
        "CASE WHEN p.scale > 0 THEN p.min_val + c.codes[p.dim + 1] / p.scale ELSE p.min_val END AS d " +
        "FROM c JOIN embeddings emb USING (vec_id), p), " +
        "e AS (SELECT vec_id, dim, round(d * d, 6) AS err FROM e0) " +
        "SELECT CAST(dim AS BIGINT) AS dim, n_vecs, sum_err_micros, " +
        "sum_err_micros // n_vecs AS mean_err_micros " +
        "FROM (SELECT dim, CAST(count(*) AS BIGINT) AS n_vecs, " +
        "CAST(sum(CAST(round(err * 1000000) AS BIGINT)) AS BIGINT) AS sum_err_micros " +
        "FROM e GROUP BY dim) ORDER BY dim"),
    // compressed shortlist (50) then the pq_rerank exact-L2 replay shape
    "sq_rerank_topk" ->
      (s"WITH $sqAdcCtes, " +
        "sl AS (SELECT query_id, vec_id FROM (" +
        "SELECT query_id, vec_id, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY qdist, vec_id) AS ark FROM s) " +
        "WHERE ark <= 50), " +
        "r AS (SELECT sl.query_id, sl.vec_id, " +
        "round(list_sum(list_transform(generate_series(1, 64), " +
        "i -> (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE) * " +
        "(a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE))), 6) AS l2sq " +
        "FROM sl JOIN embeddings a ON a.vec_id = sl.vec_id " +
        "JOIN embeddings b ON b.vec_id = sl.query_id) " +
        "SELECT query_id, vec_id, l2sq, rk FROM (" +
        "SELECT query_id, vec_id, l2sq, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY l2sq, vec_id) AS rk FROM r) " +
        "WHERE rk <= 10"),
    "pq_rerank_topk" ->
      (s"WITH $pqAdcCtes, " +
        "sl AS (SELECT query_id, vec_id FROM (" +
        "SELECT query_id, vec_id, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS ark FROM s) " +
        "WHERE ark <= 50), " +
        "r AS (SELECT sl.query_id, sl.vec_id, " +
        "round(list_sum(list_transform(generate_series(1, 64), " +
        "i -> (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE) * " +
        "(a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE))), 6) AS l2sq " +
        "FROM sl JOIN embeddings a ON a.vec_id = sl.vec_id " +
        "JOIN embeddings b ON b.vec_id = sl.query_id) " +
        "SELECT query_id, vec_id, l2sq, rk FROM (" +
        "SELECT query_id, vec_id, l2sq, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY l2sq, vec_id) AS rk FROM r) " +
        "WHERE rk <= 10"),
    "text_stats" -> textStatsSql,
    "lang_id" -> langIdSql,
    // confusion rollup of the same guess against the labeled lang; the
    // share is one division of exact counts over a label-sized window
    "lang_confusion" ->
      (s"WITH g AS ($langIdSql), " +
        "j AS (SELECT d.lang, g.lang_guess FROM documents d JOIN g ON d.doc_id = g.doc_id), " +
        "c AS (SELECT lang, lang_guess, count(*) AS n_docs FROM j GROUP BY 1, 2) " +
        "SELECT lang, lang_guess, n_docs, " +
        "round(n_docs::DOUBLE / sum(n_docs) OVER (PARTITION BY lang), 6) AS row_share " +
        "FROM c ORDER BY lang, lang_guess"),
    // per-language fertility: same tokenizer semantics as text_stats
    // (whitespace words over TRIMMED text; BPE-ish regex over the raw)
    "tokenizer_fertility" ->
      ("WITH t AS (SELECT lang, " +
        "CASE WHEN len(trim(coalesce(text, ''))) = 0 THEN 0 " +
        "ELSE len(string_split_regex(trim(coalesce(text, '')), '\\s+')) END AS n_tok, " +
        "len(regexp_extract_all(coalesce(text, ''), '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe " +
        "FROM documents) " +
        "SELECT lang, CAST(sum(n_tok) AS BIGINT) AS n_words, " +
        "CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens, " +
        "round(sum(n_bpe)::DOUBLE / sum(n_tok), 6) AS fertility " +
        "FROM t GROUP BY lang ORDER BY lang"),
    "clean_corpus" ->
      (s"WITH k AS ($exactDedupSql), s AS ($textStatsSql), l AS ($langIdSql) " +
        "SELECT s.doc_id, l.lang_guess, s.quality_score " +
        "FROM k JOIN s ON s.doc_id = k.keep_doc_id JOIN l ON l.doc_id = s.doc_id " +
        "WHERE s.quality_score >= 0.45 AND l.lang_guess = 'en'"),
    "doc_fingerprint" ->
      ("SELECT doc_id, list_min(list_transform(list_distinct(list_transform(" +
        "generate_series(1, greatest(len(coalesce(text,''))-7, 0)), i -> coalesce(text,'')[i:i+7])), " +
        "s -> md5(s))) AS fingerprint FROM documents"),
    "lang_source_rollup" ->
      ("SELECT lang, source, CAST(grouping_id(lang, source) AS BIGINT) AS gid, " +
        "count(*) AS n_docs, round(avg(n_chars) + 1e-9, 2) AS avg_chars " +
        "FROM documents GROUP BY ROLLUP(lang, source) ORDER BY gid, lang, source"),
    // window formulation of the same bottom-k-by-hash sample (the Spark
    // side computes it as a mergeable partial aggregate instead)
    "sampled_users_per_type" ->
      ("WITH d AS (SELECT DISTINCT event_type, user_id FROM events " +
        "WHERE user_id IS NOT NULL), " +
        "r AS (SELECT event_type, user_id, row_number() OVER (" +
        "PARTITION BY event_type " +
        "ORDER BY md5(CAST(user_id AS VARCHAR)), CAST(user_id AS VARCHAR)) AS rk " +
        "FROM d) " +
        "SELECT event_type, rk, user_id FROM r WHERE rk <= 8 " +
        "ORDER BY event_type, rk"),
    // split bands over the identical md5 prefix: train < 0.90·16^8
    // (e6666666) <= val < 0.95·16^8 (f3333333) <= test
    "corpus_splits" ->
      ("WITH t AS (SELECT doc_id, CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
        "ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks FROM documents) " +
        "SELECT doc_id, CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'train' " +
        "WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'f3333333' THEN 'val' " +
        "ELSE 'test' END AS split, len(toks) AS n_tokens FROM t"),
    // the full mixing derivation replayed: token totals per language,
    // data-derived rates against the same literal budgets, threshold hex
    // (round(rate·16^8), 'g' = keep-all sentinel), identical md5 gate
    // temperature mixing: share → p^0.7 → normalized weight; every double
    // rounded to 6 decimals AFTER each engine's own pow/sum (libm last-ulp
    // drift cannot survive r6), targets derived from the ROUNDED weight
    "mixture_temperature" ->
      ("WITH t AS (SELECT doc_id, lang, CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
        "ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks FROM documents), " +
        "d AS (SELECT doc_id, lang, len(toks) AS n_tokens FROM t), " +
        "tot AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS lang_tokens FROM d GROUP BY lang HAVING sum(n_tokens) > 0), " +
        "g AS (SELECT lang, lang_tokens, lang_tokens::DOUBLE / sum(lang_tokens) OVER ()::DOUBLE AS share FROM tot), " +
        "p AS (SELECT lang, lang_tokens, share, power(share, 0.7) AS pw FROM g), " +
        "w AS (SELECT lang, lang_tokens, share, round(pw / sum(pw) OVER (), 6) AS weight FROM p), " +
        "x AS (SELECT lang, lang_tokens, round(share, 6) AS share, weight, " +
        "CAST(round(weight * 100000.0) AS BIGINT) AS target_tokens FROM w) " +
        "SELECT lang, lang_tokens, share, weight, target_tokens, " +
        "round(target_tokens::DOUBLE / lang_tokens::DOUBLE, 6) AS mix_ratio " +
        "FROM x ORDER BY lang"),
    "corpus_mixture" ->
      ("WITH t AS (SELECT doc_id, lang, CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
        "ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks FROM documents), " +
        "d AS (SELECT doc_id, lang, len(toks) AS n_tokens FROM t), " +
        "tot AS (SELECT lang, sum(n_tokens) AS lang_tokens FROM d GROUP BY lang HAVING sum(n_tokens) > 0), " +
        "b(lang, budget) AS (VALUES ('en', 5000), ('fr', 2000000000)), " +
        "r AS (SELECT tot.lang, least(1.0, coalesce(b.budget, tot.lang_tokens)::DOUBLE / tot.lang_tokens::DOUBLE) AS rate " +
        "FROM tot LEFT JOIN b USING (lang)), " +
        "g AS (SELECT d.doc_id, d.lang, d.n_tokens, " +
        "CAST(round(r.rate * 4294967296) AS BIGINT) AS units FROM d JOIN r USING (lang)) " +
        "SELECT doc_id, lang, n_tokens FROM g " +
        "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < " +
        "CASE WHEN units >= 4294967296 THEN 'g' ELSE lpad(lower(to_hex(units)), 8, '0') END"),
    // the epoch-repeat form: floor(ratio) ungated epochs + one fractional
    // epoch under the same md5 gate at rate (ratio - floor)
    "corpus_mixture_epochs" ->
      ("WITH t AS (SELECT doc_id, lang, CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
        "ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks FROM documents), " +
        "d AS (SELECT doc_id, lang, len(toks) AS n_tokens FROM t), " +
        "tot AS (SELECT lang, sum(n_tokens) AS lang_tokens FROM d GROUP BY lang HAVING sum(n_tokens) > 0), " +
        "b(lang, budget) AS (VALUES ('en', 5000), ('de', 8000)), " +
        "r0 AS (SELECT tot.lang, coalesce(b.budget, tot.lang_tokens)::DOUBLE / tot.lang_tokens::DOUBLE AS ratio " +
        "FROM tot LEFT JOIN b USING (lang)), " +
        "r AS (SELECT lang, CAST(floor(ratio) AS BIGINT) AS full_epochs, ratio - floor(ratio) AS frac FROM r0), " +
        "e AS (SELECT unnest(generate_series(1, (SELECT max(full_epochs) + 1 FROM r))) AS epoch), " +
        "g AS (SELECT d.doc_id, d.lang, d.n_tokens, r.full_epochs, " +
        "CAST(round(r.frac * 4294967296) AS BIGINT) AS units, e.epoch " +
        "FROM d JOIN r USING (lang) CROSS JOIN e WHERE e.epoch <= r.full_epochs + 1) " +
        "SELECT doc_id, lang, n_tokens, epoch FROM g " +
        "WHERE epoch <= full_epochs OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < " +
        "CASE WHEN units >= 4294967296 THEN 'g' ELSE lpad(lower(to_hex(units)), 8, '0') END"),
    // identical md5 hash-gate predicate (thresholds = fraction × 16^8 in hex)
    "stratified_sample" ->
      ("SELECT doc_id, lang FROM documents WHERE CASE WHEN lang = 'en' " +
        "THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '40000000' " +
        "ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '80000000' END"),
    // A-ES priorities replayed exactly: same md5 units → the same exact
    // double u (division by 2^32 is exact), ln micro-quantized to BIGINT
    // before the single IEEE division by the token weight
    "weighted_sample" ->
      (s"WITH $toksCte, " +
        "w AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS weight FROM t " +
        "WHERE len(toks) > 0), " +
        "p AS (SELECT doc_id, weight, CAST(round(ln(" +
        "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT + 1) " +
        "/ 4294967296.0) * 1000000) AS BIGINT) AS ln_u_micros FROM w), " +
        "r AS (SELECT doc_id, weight, ln_u_micros, CAST(row_number() OVER (" +
        "ORDER BY CAST(ln_u_micros AS DOUBLE) / weight DESC, doc_id) AS INTEGER) AS rk " +
        "FROM p) " +
        "SELECT rk, doc_id, weight, ln_u_micros FROM r WHERE rk <= 100"),
    // per-source cap replayed with one window over the shared quality CTE
    // (same (score desc, doc_id) order, so the cut is deterministic)
    "source_capped_corpus" ->
      (s"WITH st AS ($textStatsSql), " +
        "j AS (SELECT d.doc_id, d.source, st.quality_score " +
        "FROM documents d JOIN st USING (doc_id)) " +
        "SELECT doc_id, source, quality_score, rk FROM (" +
        "SELECT doc_id, source, quality_score, " +
        "CAST(row_number() OVER (PARTITION BY source " +
        "ORDER BY quality_score DESC, doc_id) AS BIGINT) AS rk FROM j) " +
        "WHERE rk <= 10"),
    // explode + group-by twin of the fused per-row repetition signals:
    // line multiplicities and bigram multiplicities re-derived relationally,
    // every fraction one exact-integer division (+1e-9 nudge, 4-dp round)
    "repetition_stats" -> repetitionStatsSql,
    // unnest + group-by twin of the wordcount; same (count desc, token)
    // deterministic top-100 cut
    "vocab_stats" ->
      (s"WITH $toksCte, ex AS (SELECT doc_id, unnest(toks) AS token FROM t) " +
        "SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS doc_freq " +
        "FROM ex GROUP BY token ORDER BY n_occurrences DESC, token LIMIT 100"),
    // same trim/split tokenization; within-word multiplicity via
    // non-distinct list_transform slices, (count desc, pair) top-50 cut
    "bpe_pair_counts" ->
      (s"WITH $toksCte, w AS (SELECT unnest(toks) AS word FROM t), " +
        "p AS (SELECT unnest(list_transform(generate_series(1, len(word)-1), " +
        "i -> word[i:i+1])) AS pair FROM w WHERE len(word) >= 2) " +
        "SELECT pair, count(*) AS n FROM p GROUP BY pair " +
        "ORDER BY n DESC, pair LIMIT 50"),
    // BPE usage rollup re-exploded from the tokenized dump (the learn loop
    // lives in the dumps; the aggregation derivation is what's checked)
    "bpe_vocab_usage" ->
      ("SELECT token, count(*) AS n FROM (" +
        "SELECT unnest(string_split(tokenized, ' ')) AS token " +
        "FROM read_parquet('{OUT}/bpe_tokenized/*.parquet')) " +
        "WHERE token <> '' GROUP BY token"),
    // BPE LEARN replayed exactly (bpe_merges was rows-only until r12; see
    // learnLoopCtes): 50 recursive rounds over the wrapped word states,
    // argmax pair by (count DESC, left, right) — the Scala minBy
    // (-c, a, b) — each round's pair carried on its rows
    "bpe_merges" ->
      (s"WITH RECURSIVE ${learnLoopCtes(
        contMark = "",
        mergedSql = "bp.a || bp.b",
        argmaxSql = "SELECT s.syms[i] AS a, s.syms[i+1] AS b " +
          s"FROM (SELECT cnt, string_split(trim(state, $sepSql), $sepSql || $sepSql) AS syms FROM st) s, " +
          "unnest(generate_series(1, len(s.syms) - 1)) u(i) " +
          "GROUP BY 1, 2 ORDER BY CAST(sum(s.cnt) AS BIGINT) DESC, a, b LIMIT 1")} " +
        "SELECT DISTINCT CAST(rnd - 1 AS INTEGER) AS rank, l AS \"left\", r AS \"right\" " +
        "FROM st WHERE rnd >= 1"),
    // WordPiece LEARN replayed exactly (wordpiece_vocab was rows-only
    // until r12): same skeleton, continuation symbols spelled ##, argmax
    // by the LIKELIHOOD ratio pc/(sc_a*sc_b). The Scala compares ratios by
    // exact BigInt cross-multiplication; here each ratio becomes
    // floor(pc*10^30 / (sc_a*sc_b)) in HUGEINT — EXACT for the fixture's
    // count range: with total tokens T, distinct ratios differ by at least
    // 1/T^4, so the scaled floors differ by ≥ 10^30/T^4 − 2 (> 0 for any
    // T ≤ 10^7), equal ratios floor equal, and pc*10^30 ≤ T·10^30 < 2^127.
    // The vocab set = per-word alphabet (first char plain, rest ##) plus
    // each round's merged symbol; output classification is textual
    // (LIKE '##%'), matching the Scala's startsWith("##")
    "wordpiece_vocab" ->
      (s"WITH RECURSIVE ${learnLoopCtes(
        contMark = "##",
        mergedSql = "bp.a || CASE WHEN bp.b LIKE '##%' THEN substr(bp.b, 3) ELSE bp.b END",
        argmaxSql = "SELECT p.a AS a, p.b AS b FROM " +
          "(SELECT s.syms[i] AS a, s.syms[i+1] AS b, CAST(sum(s.cnt) AS BIGINT) AS pc " +
          s"FROM (SELECT cnt, string_split(trim(state, $sepSql), $sepSql || $sepSql) AS syms FROM st) s, " +
          "unnest(generate_series(1, len(s.syms) - 1)) u(i) GROUP BY 1, 2) p " +
          s"JOIN ($symCountsSql) sa ON sa.sym = p.a " +
          s"JOIN ($symCountsSql) sb ON sb.sym = p.b " +
          "ORDER BY (p.pc::HUGEINT * '1000000000000000000000000000000'::HUGEINT) " +
          "// (sa.sc::HUGEINT * sb.sc::HUGEINT) DESC, p.a, p.b LIMIT 1")}, " +
        "alpha AS (SELECT DISTINCT CASE WHEN i = 1 THEN word[i:i] ELSE '##' || word[i:i] END AS sym " +
        "FROM wc, unnest(generate_series(1, len(word))) u(i)), " +
        "v AS (SELECT DISTINCT sym FROM (SELECT sym FROM alpha " +
        "UNION ALL SELECT merged AS sym FROM st WHERE merged IS NOT NULL)) " +
        "SELECT CASE WHEN sym LIKE '##%' THEN substr(sym, 3) ELSE sym END AS piece, " +
        "CASE WHEN sym LIKE '##%' THEN 1 ELSE 0 END AS is_cont FROM v"),
    // BPE apply replayed exactly: per distinct word, one merge per
    // recursion step — the position list unnests, pairs join the dumped
    // rank table, QUALIFY keeps (lowest rank, leftmost) — and the word's
    // final state is its max-step row (a stuck word emits nothing more).
    // Docs reassemble by word ordinal; the learn LOOP stays a dump (its
    // argmax is over a mutating pair-count table, nothing static to join)
    "bpe_tokenized" ->
      (s"WITH RECURSIVE $toksCte, " +
        "m AS (SELECT rank, \"left\" AS l, \"right\" AS r " +
        "FROM read_parquet('{OUT}/bpe_merges/*.parquet')), " +
        "w AS (SELECT doc_id, unnest(toks) AS word, " +
        "unnest(generate_series(1, len(toks))) AS idx FROM t), " +
        "dw AS (SELECT DISTINCT word FROM w), " +
        "seg AS (SELECT word, 0 AS step, " +
        "list_transform(generate_series(1, len(word)), i -> word[i:i]) AS syms FROM dw " +
        "UNION ALL " +
        "(SELECT s.word, s.step + 1, " +
        "s.syms[1:i-1] || [m.l || m.r] || s.syms[i+2:] AS syms " +
        "FROM seg s, unnest(generate_series(1, len(s.syms)-1)) u(i) " +
        "JOIN m ON m.l = s.syms[i] AND m.r = s.syms[i+1] " +
        "QUALIFY row_number() OVER (PARTITION BY s.word, s.step " +
        "ORDER BY m.rank, i) = 1)), " +
        "fin AS (SELECT word, syms FROM seg " +
        "QUALIFY row_number() OVER (PARTITION BY word ORDER BY step DESC) = 1), " +
        "wt AS (SELECT w.doc_id, w.idx, len(f.syms) AS n, " +
        "array_to_string(f.syms, ' ') AS wtoks FROM w JOIN fin f USING (word)), " +
        "agg AS (SELECT doc_id, string_agg(wtoks, ' ' ORDER BY idx) AS tokenized, " +
        "sum(n) AS n_tokens FROM wt GROUP BY doc_id) " +
        "SELECT t.doc_id, CAST(coalesce(agg.n_tokens, 0) AS BIGINT) AS n_tokens, " +
        "coalesce(agg.tokenized, '') AS tokenized FROM t LEFT JOIN agg USING (doc_id)"),
    // WordPiece apply replayed exactly: greedy longest-match-first is a
    // deterministic single-path walk, so a recursive CTE advances one
    // (word, cursor) state per word — QUALIFY keeps the longest matching
    // piece (continuations only off position 1) — and a word whose walk
    // gets stuck (or exceeds 100 chars) never completes → [UNK], the HF
    // WordpieceTokenizer contract. Docs reassemble by word ordinal.
    "wordpiece_tokenized" ->
      (s"WITH RECURSIVE $toksCte, " +
        "v AS (SELECT piece, is_cont FROM read_parquet('{OUT}/wordpiece_vocab/*.parquet')), " +
        "w AS (SELECT doc_id, unnest(toks) AS word, " +
        "unnest(generate_series(1, len(toks))) AS idx FROM t), " +
        "dw AS (SELECT DISTINCT word FROM w WHERE len(word) <= 100), " +
        "seg AS (SELECT word, 1 AS pos, CAST('' AS VARCHAR) AS toks FROM dw " +
        "UNION ALL " +
        "(SELECT s.word, s.pos + len(v.piece) AS pos, " +
        "s.toks || CASE WHEN s.toks = '' THEN '' ELSE ' ' END || " +
        "CASE WHEN s.pos > 1 THEN '##' || v.piece ELSE v.piece END AS toks " +
        "FROM seg s JOIN v ON v.is_cont = CASE WHEN s.pos > 1 THEN 1 ELSE 0 END " +
        "AND substr(s.word, s.pos, len(v.piece)) = v.piece " +
        "WHERE s.pos <= len(s.word) " +
        "QUALIFY row_number() OVER (PARTITION BY s.word, s.pos " +
        "ORDER BY len(v.piece) DESC, v.piece) = 1)), " +
        "done AS (SELECT word, toks FROM seg WHERE pos > len(word)), " +
        "wt AS (SELECT w.doc_id, w.idx, coalesce(d.toks, '[UNK]') AS wtoks " +
        "FROM w LEFT JOIN done d USING (word)), " +
        "agg AS (SELECT doc_id, string_agg(wtoks, ' ' ORDER BY idx) AS tokenized, " +
        "sum(len(string_split(wtoks, ' '))) AS n_tokens FROM wt GROUP BY doc_id) " +
        "SELECT t.doc_id, CAST(coalesce(agg.n_tokens, 0) AS BIGINT) AS n_tokens, " +
        "coalesce(agg.tokenized, '') AS tokenized FROM t LEFT JOIN agg USING (doc_id)"),
    "wordpiece_vocab_usage" ->
      ("SELECT token, count(*) AS n FROM (" +
        "SELECT unnest(string_split(tokenized, ' ')) AS token " +
        "FROM read_parquet('{OUT}/wordpiece_tokenized/*.parquet')) " +
        "WHERE token <> '' GROUP BY token"),
    // Unigram-LM Viterbi replayed exactly: the recursion advances every
    // word one character per step, carrying dp (BIGINT micro log-prob per
    // prefix) and the best segmentation per prefix as LISTs; candidate
    // scores come from a map over the dumped piece table, the argmax index
    // is list_position's FIRST hit (= the Spark strict-> smallest-split
    // tie-break), and an all-NULL dp tail is an unsegmentable word → [UNK]
    "unigram_tokenized" ->
      (s"WITH RECURSIVE $toksCte, " +
        "vm AS (SELECT map(list(piece), list(CAST(logp_micros AS BIGINT))) AS m " +
        "FROM read_parquet('{OUT}/unigram_vocab/*.parquet')), " +
        "w AS (SELECT doc_id, unnest(toks) AS word, " +
        "unnest(generate_series(1, len(toks))) AS idx FROM t), " +
        "dw AS (SELECT DISTINCT word FROM w), " +
        "seg AS (SELECT word, 0 AS k, [CAST(0 AS BIGINT)] AS dp, " +
        "[CAST('' AS VARCHAR)] AS segs FROM dw " +
        "UNION ALL " +
        "SELECT word, k + 1, dp || [list_max(cands)] AS dp, " +
        "segs || [CASE WHEN list_max(cands) IS NULL THEN NULL ELSE " +
        "segs[list_position(cands, list_max(cands))] || " +
        "CASE WHEN list_position(cands, list_max(cands)) > 1 THEN ' ' ELSE '' END || " +
        "substr(word, list_position(cands, list_max(cands)), " +
        "k + 2 - list_position(cands, list_max(cands))) END] AS segs " +
        "FROM (SELECT s.word, s.k, s.dp, s.segs, " +
        "list_transform(generate_series(1, s.k + 1), " +
        "i -> s.dp[i] + vm.m[substr(s.word, i, s.k + 2 - i)][1]) AS cands " +
        "FROM seg s, vm WHERE s.k < len(s.word))), " +
        "fin AS (SELECT word, coalesce(segs[len(word) + 1], '[UNK]') AS wtoks " +
        "FROM seg WHERE k = len(word)), " +
        "wt AS (SELECT w.doc_id, w.idx, f.wtoks, " +
        "len(string_split(f.wtoks, ' ')) AS n FROM w JOIN fin f USING (word)), " +
        "agg AS (SELECT doc_id, string_agg(wtoks, ' ' ORDER BY idx) AS tokenized, " +
        "sum(n) AS n_tokens FROM wt GROUP BY doc_id) " +
        "SELECT t.doc_id, CAST(coalesce(agg.n_tokens, 0) AS BIGINT) AS n_tokens, " +
        "coalesce(agg.tokenized, '') AS tokenized FROM t LEFT JOIN agg USING (doc_id)"),
    "unigram_vocab_usage" ->
      ("SELECT token, count(*) AS n FROM (" +
        "SELECT unnest(string_split(tokenized, ' ')) AS token " +
        "FROM read_parquet('{OUT}/unigram_tokenized/*.parquet')) " +
        "WHERE token <> '' GROUP BY token"),
    // the same exploded count / count-distinct per dump; fertility with
    // the identical integer-micros division
    "tokenizer_fertility_compare" ->
      (s"WITH $toksCte, tw AS (SELECT CAST(sum(len(toks)) AS BIGINT) AS total_words FROM t), " +
        "u AS (SELECT 'bpe' AS tokenizer, token FROM (SELECT unnest(string_split(tokenized, ' ')) AS token " +
        "FROM read_parquet('{OUT}/bpe_tokenized/*.parquet')) WHERE token <> '' " +
        "UNION ALL SELECT 'unigram', token FROM (SELECT unnest(string_split(tokenized, ' ')) AS token " +
        "FROM read_parquet('{OUT}/unigram_tokenized/*.parquet')) WHERE token <> '' " +
        "UNION ALL SELECT 'wordpiece', token FROM (SELECT unnest(string_split(tokenized, ' ')) AS token " +
        "FROM read_parquet('{OUT}/wordpiece_tokenized/*.parquet')) WHERE token <> '') " +
        "SELECT tokenizer, CAST(count(*) AS BIGINT) AS total_tokens, " +
        "CAST(count(*) * 1000000 // tw.total_words AS BIGINT) AS fertility_micros, " +
        "CAST(count(DISTINCT token) AS BIGINT) AS pieces_used " +
        "FROM u, tw GROUP BY tokenizer, tw.total_words"),
    // exact-gram twin of the hashed-gram Spark plan (xxhash64 keys can only
    // ADD covered positions, at ~B²/2^65 expected colliding pairs); same
    // island merge via lag/sum windows
    "dup_spans" ->
      s"WITH $dupSpansCtes SELECT doc_id, span_start, span_end, n_span_tokens FROM sp",
    // covered starts expanded to covered token indexes, kept tokens
    // re-joined in position order; docs re-enter via left joins so
    // span-free and all-span docs both surface (trimmed to '' not dropped)
    "span_trimmed_corpus" ->
      (s"WITH $dupSpansCtes, $spanTrimTailCtes " +
        "SELECT doc_id, n_tokens, n_dropped_tokens, text_trimmed FROM tr"),
    // the same span chain, trim tail fed only by merged spans of >= 50
    // tokens (token indexes expanded from the surviving spans directly)
    "long_span_trimmed_corpus" ->
      (s"WITH $dupSpansCtes, " +
        spanTrimTailOver("SELECT doc_id, unnest(generate_series(span_start, span_end)) AS ti " +
          "FROM sp WHERE n_span_tokens >= 50") +
        " SELECT doc_id, n_tokens, n_dropped_tokens, text_trimmed FROM tr"),
    // keep-first block dedup: same 8-token non-overlapping blocking, a
    // window (first-occurrence rank + per-block count) instead of the
    // min-struct agg, ordered string_agg rebuild — the kept set is
    // identical because both engines order by (doc_id, block_id)
    "block_dedup_corpus" ->
      (s"WITH $toksCte, nz AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0), " +
        "c AS (SELECT doc_id, unnest(generate_series(0, (len(toks)-1)//8)) AS block_id, toks FROM nz), " +
        "bl AS (SELECT doc_id, block_id, " +
        "array_to_string(toks[block_id*8+1 : block_id*8+8], ' ') AS block FROM c), " +
        "k AS (SELECT doc_id, block_id, block, " +
        "row_number() OVER (PARTITION BY block ORDER BY doc_id, block_id) AS rn, " +
        "count(*) OVER (PARTITION BY block) AS n_occ FROM bl), " +
        "kept AS (SELECT doc_id, block_id, block FROM k WHERE n_occ = 1 OR rn = 1), " +
        "tot AS (SELECT doc_id, (len(toks)-1)//8 + 1 AS n_blocks FROM nz), " +
        "ka AS (SELECT doc_id, count(*) AS n_blocks_kept, " +
        "string_agg(block, ' ' ORDER BY block_id) AS deduped_text FROM kept GROUP BY doc_id) " +
        "SELECT tot.doc_id, CAST(n_blocks AS BIGINT) AS n_blocks, " +
        "CAST(coalesce(n_blocks_kept, 0) AS BIGINT) AS n_blocks_kept, " +
        "coalesce(deduped_text, '') AS deduped_text " +
        "FROM tot LEFT JOIN ka ON tot.doc_id = ka.doc_id"),
    // exact-gram twin of the hashed benchmark-overlap probe + island merge
    "contamination_spans" ->
      (s"WITH $contamSpanCtes SELECT doc_id, span_start, span_end, n_span_tokens FROM sp"),
    // surgical decontamination: the same trim tail over benchmark-covered
    // positions — every trainable doc surfaces, overlap runs cut out
    "contamination_trimmed_corpus" ->
      (s"WITH $contamSpanCtes, $spanTrimTailCtes " +
        "SELECT doc_id, n_tokens, n_dropped_tokens, text_trimmed FROM tr"),
    // the Lee-et-al release chain: exact+near dedup survivors (trainable
    // slice) → span trim with gram counts over the SURVIVORS → 8-gram
    // contamination sweep over the TRIMMED text vs the benchmark slice —
    // every stage the same shared twin the standalone entries use
    "trimmed_release_corpus" ->
      (s"WITH k AS MATERIALIZED ($exactDedupSql), nd AS MATERIALIZED ($nearDupPairsSql), " +
        "surv AS MATERIALIZED (SELECT d.doc_id, d.text FROM documents d " +
        "JOIN k ON d.doc_id = k.keep_doc_id " +
        "WHERE d.doc_id NOT IN (SELECT b_doc_id FROM nd) AND d.doc_id % 10 <> 0), " +
        s"${spanCtesOver("surv")}, $spanTrimTailCtes, " +
        "trtok AS (SELECT doc_id, CASE WHEN len(trim(text_trimmed)) = 0 THEN [] " +
        "ELSE string_split_regex(trim(text_trimmed), '\\s+') END AS toks FROM tr), " +
        "cg AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 8 THEN [] " +
        "ELSE list_distinct(list_transform(generate_series(1, len(toks)-7), " +
        "i -> array_to_string(toks[i:i+7], ' '))) END) AS gram FROM trtok), " +
        "btok AS (SELECT doc_id, CASE WHEN len(trim(coalesce(text,''))) = 0 THEN [] " +
        "ELSE string_split_regex(trim(coalesce(text,'')), '\\s+') END AS toks " +
        "FROM documents WHERE doc_id % 10 = 0), " +
        "bg AS (SELECT DISTINCT gram FROM (SELECT unnest(CASE WHEN len(toks) < 8 THEN [] " +
        "ELSE list_distinct(list_transform(generate_series(1, len(toks)-7), " +
        "i -> array_to_string(toks[i:i+7], ' '))) END) AS gram FROM btok)), " +
        "hits AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (gram)) " +
        "SELECT doc_id, n_tokens, n_dropped_tokens, text_trimmed FROM tr " +
        "WHERE doc_id NOT IN (SELECT doc_id FROM hits)"),
    // same md5 band thresholds as corpus_splits (train < e6666666 <= val <
    // f3333333 <= test), same distinct-8-gram intersection as the
    // contamination twin, rolled up to the release-report numbers
    "split_leakage" ->
      (s"WITH $toksCte, g AS (SELECT doc_id, CASE WHEN len(toks) < 8 THEN [] " +
        "ELSE list_distinct(list_transform(generate_series(1, len(toks)-7), " +
        "i -> array_to_string(toks[i:i+7], ' '))) END AS grams FROM t), " +
        "sp AS (SELECT doc_id, CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'train' " +
        "WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'f3333333' THEN 'val' ELSE 'test' END AS split FROM t), " +
        "tr AS (SELECT g.doc_id, unnest(grams) AS gram FROM g JOIN sp USING (doc_id) WHERE sp.split = 'train'), " +
        "te AS (SELECT g.doc_id AS bench_id, unnest(grams) AS gram FROM g JOIN sp USING (doc_id) WHERE sp.split = 'test'), " +
        "pr AS (SELECT tr.doc_id, te.bench_id, count(*) AS n_shared " +
        "FROM tr JOIN te ON tr.gram = te.gram GROUP BY 1, 2) " +
        "SELECT count(*) AS n_leak_pairs, count(DISTINCT doc_id) AS n_train_docs, " +
        "count(DISTINCT bench_id) AS n_test_docs, CAST(sum(n_shared) AS BIGINT) AS n_shared_grams FROM pr"),
    // embedding-space twin of the contamination sweep: brute-force rounded
    // cosine against the vec_id%10==0 benchmark slice, rolled up per vec
    "semantic_contamination" ->
      ("SELECT c.vec_id, count(*) AS n_bench_hits, " +
        "max(round(list_cosine_similarity(c.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)) AS max_cosine " +
        "FROM embeddings c JOIN embeddings b ON c.vec_id % 10 <> 0 AND b.vec_id % 10 = 0 " +
        "WHERE round(list_cosine_similarity(c.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35 " +
        "GROUP BY c.vec_id"),
    // the sketch is EXACT in the no-eviction regime (31 distinct fixture
    // tokens << capacity 256), so the exact-count twin applies verbatim
    "vocab_stats_sketch" ->
      (s"WITH $toksCte, ex AS (SELECT unnest(toks) AS token FROM t) " +
        "SELECT token, count(*) AS n_occurrences " +
        "FROM ex GROUP BY token ORDER BY n_occurrences DESC, token LIMIT 100"),
    // same distinct-8-grams derivation as the contamination twin, rolled up
    // to document frequency (grams are distinct per doc, so count(*) = df)
    "ngram_doc_freq" ->
      (s"WITH $toksCte, g AS (SELECT doc_id, CASE WHEN len(toks) < 8 THEN [] " +
        "ELSE list_distinct(list_transform(generate_series(1, len(toks)-7), " +
        "i -> array_to_string(toks[i:i+7], ' '))) END AS grams FROM t), " +
        "ex AS (SELECT doc_id, unnest(grams) AS gram FROM g) " +
        "SELECT gram, count(*) AS doc_freq FROM ex GROUP BY gram " +
        "HAVING count(*) >= 2"),
    // tf and df re-derived relationally; score = one IEEE division of exact
    // integers (+1e-9 nudge, 6-dp round — 1/128 is a real 7-digit boundary)
    "tfidf_top_terms" ->
      (s"WITH $toksCte, ex AS (SELECT doc_id, unnest(toks) AS token FROM t), " +
        "tf AS (SELECT doc_id, token, count(*) AS tf FROM ex GROUP BY 1, 2), " +
        "df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1), " +
        "s AS (SELECT tf.doc_id, tf.token, " +
        "round(tf.tf::DOUBLE / df.df + 1e-9, 6) AS score " +
        "FROM tf JOIN df USING (token)) " +
        "SELECT doc_id, token, score, rk FROM (" +
        "SELECT doc_id, token, score, " +
        "row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rk FROM s) " +
        "WHERE rk <= 3"),
    // stride-64 list slices: generate_series chunk ids, inclusive 1-based
    // slice bounds truncate at the ragged tail exactly like Spark's slice
    "doc_chunks" ->
      (s"WITH $chunksCtes SELECT doc_id, chunk_id, n_chunk_tokens, chunk_md5 FROM ch"),
    // same chunk derivation + md5-mod shard + integer running-total cut:
    // (cumsum-before // 256) replayed with the identical window order
    // same packing derivation rolled up per shard: fill + overflow audit
    // bit-length buckets (integer-exact floor(log2)+1 via bin()), md5-mod
    // shard, per-(shard,bucket) row_number batches, integer fill micros
    "length_bucketed_batches" ->
      (s"WITH $toksCte, d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens " +
        "FROM t WHERE len(toks) >= 1), " +
        "s AS (SELECT doc_id, n_tokens, " +
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS shard, " +
        "CAST(length(bin(n_tokens)) AS INTEGER) AS bucket FROM d), " +
        "r AS (SELECT shard, bucket, n_tokens, " +
        "CAST((row_number() OVER (PARTITION BY shard, bucket ORDER BY doc_id) - 1) // 8 AS BIGINT) AS batch_idx " +
        "FROM s) " +
        "SELECT shard, bucket, batch_idx, CAST(count(*) AS BIGINT) AS n_docs, " +
        "max(n_tokens) AS max_tokens, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens, " +
        "CAST(sum(n_tokens) * 1000000 // (count(*) * max(n_tokens)) AS BIGINT) AS fill_micros " +
        "FROM r GROUP BY shard, bucket, batch_idx"),
    // both strategies replayed (the bucketed CTEs above without the bucket
    // key for the sequential row), rolled up to the corpus totals
    "padding_waste_report" ->
      (s"WITH $toksCte, d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens " +
        "FROM t WHERE len(toks) >= 1), " +
        "s AS (SELECT doc_id, n_tokens, " +
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS shard, " +
        "CAST(length(bin(n_tokens)) AS INTEGER) AS bucket FROM d), " +
        "rb AS (SELECT shard, bucket, n_tokens, " +
        "CAST((row_number() OVER (PARTITION BY shard, bucket ORDER BY doc_id) - 1) // 8 AS BIGINT) AS batch_idx FROM s), " +
        "bb AS (SELECT count(*) AS n_docs, max(n_tokens) AS max_tokens, sum(n_tokens) AS sum_tokens " +
        "FROM rb GROUP BY shard, bucket, batch_idx), " +
        "rs AS (SELECT shard, n_tokens, " +
        "CAST((row_number() OVER (PARTITION BY shard ORDER BY doc_id) - 1) // 8 AS BIGINT) AS batch_idx FROM s), " +
        "bs AS (SELECT count(*) AS n_docs, max(n_tokens) AS max_tokens, sum(n_tokens) AS sum_tokens " +
        "FROM rs GROUP BY shard, batch_idx), " +
        "u AS (SELECT 'bucketed' AS strategy, * FROM bb UNION ALL SELECT 'sequential', * FROM bs) " +
        "SELECT strategy, CAST(count(*) AS BIGINT) AS n_batches, " +
        "CAST(sum(sum_tokens) AS BIGINT) AS real_tokens, " +
        "CAST(sum(n_docs * max_tokens) AS BIGINT) AS padded_tokens, " +
        "CAST(sum(sum_tokens) * 1000000 // sum(n_docs * max_tokens) AS BIGINT) AS fill_micros " +
        "FROM u GROUP BY strategy"),
    "packing_efficiency" ->
      (s"WITH $chunksCtes, sh AS (SELECT doc_id, chunk_id, n_chunk_tokens, " +
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS shard FROM ch), " +
        "p AS (SELECT shard, doc_id, n_chunk_tokens, " +
        "CAST((sum(n_chunk_tokens) OVER (PARTITION BY shard ORDER BY doc_id, chunk_id " +
        "ROWS UNBOUNDED PRECEDING) - n_chunk_tokens) // 256 AS BIGINT) AS pack_id FROM sh), " +
        "ps AS (SELECT shard, pack_id, CAST(sum(n_chunk_tokens) AS BIGINT) AS n_tokens " +
        "FROM p GROUP BY shard, pack_id) " +
        "SELECT shard, count(*) AS n_packs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens, " +
        "round(sum(n_tokens)::DOUBLE / (count(*) * 256)::DOUBLE, 6) AS mean_fill, " +
        "CAST(sum(CASE WHEN n_tokens > 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow " +
        "FROM ps GROUP BY shard ORDER BY shard"),
    "packed_sequences" ->
      (s"WITH $chunksCtes, sh AS (SELECT doc_id, chunk_id, n_chunk_tokens, " +
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS shard FROM ch), " +
        "p AS (SELECT shard, doc_id, n_chunk_tokens, " +
        "CAST((sum(n_chunk_tokens) OVER (PARTITION BY shard ORDER BY doc_id, chunk_id " +
        "ROWS UNBOUNDED PRECEDING) - n_chunk_tokens) // 256 AS BIGINT) AS pack_id FROM sh) " +
        "SELECT shard, pack_id, count(*) AS n_chunks, count(DISTINCT doc_id) AS n_docs, " +
        "CAST(sum(n_chunk_tokens) AS BIGINT) AS n_tokens " +
        "FROM p GROUP BY shard, pack_id ORDER BY shard, pack_id"),
    // identical planted-PII construction (doc_id arithmetic) and IDENTICAL
    // regex pattern strings (interpolated from Pii's constants — the shared
    // Java/RE2 subset), counts on the original text, email→phone→IP
    // redaction order
    "pii_redaction" -> piiRedactionSql,
    // select-then-scrub composition: clean_corpus's survivor set joined to
    // the redaction sweep, from the same shared subquery twins
    "redacted_corpus" ->
      (s"WITH k AS ($exactDedupSql), s AS ($textStatsSql), l AS ($langIdSql), " +
        "surv AS (SELECT s.doc_id FROM k JOIN s ON s.doc_id = k.keep_doc_id " +
        "JOIN l ON l.doc_id = s.doc_id " +
        "WHERE s.quality_score >= 0.45 AND l.lang_guess = 'en'), " +
        s"r AS ($piiRedactionSql) " +
        "SELECT r.doc_id, r.n_emails, r.n_phones, r.n_ips, r.text_redacted " +
        "FROM r JOIN surv ON r.doc_id = surv.doc_id"),
    // identical md5-prefix shard arithmetic (hex parse via 0x-cast), HUGEINT
    // sum cast back to BIGINT to match Spark's long
    "corpus_shards" ->
      (s"WITH $toksCte, s AS (SELECT " +
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS shard, " +
        "len(toks) AS n_tokens FROM t) " +
        "SELECT shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens " +
        "FROM s GROUP BY shard ORDER BY shard"),
    // reproducible training order: same md5-shard idiom as corpus_shards,
    // per-epoch hash reshuffle + per-(epoch,shard) row_number replayed
    // histogram → cumulative-from-top value threshold per epoch → gate →
    // the training_order shard/reshuffle windows; all exact integers
    "curriculum_order" ->
      (s"WITH $curriculumCtes " +
        "SELECT epoch, shard, " +
        "CAST(row_number() OVER (PARTITION BY epoch, shard ORDER BY h, doc_id) AS BIGINT) AS pos, " +
        "doc_id, qm FROM m"),
    // the dataloader contract: curriculum order + per-doc token counts +
    // the packed_sequences running-count rule, all from the shared CTEs —
    // start_tok is the per-(epoch, shard) cumulative before the doc, pack
    // and offset its exact integer div/mod by the 256-token context
    "training_manifest" ->
      (s"WITH $curriculumCtes, $toksCte, " +
        "ord AS (SELECT epoch, shard, " +
        "CAST(row_number() OVER (PARTITION BY epoch, shard ORDER BY h, doc_id) AS BIGINT) AS pos, " +
        "doc_id FROM m), " +
        "tk AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t), " +
        "c AS (SELECT o.epoch, o.shard, o.pos, o.doc_id, tk.n_tokens, " +
        "CAST(sum(tk.n_tokens) OVER (PARTITION BY o.epoch, o.shard ORDER BY o.pos " +
        "ROWS UNBOUNDED PRECEDING) - tk.n_tokens AS BIGINT) AS start_tok " +
        "FROM ord o JOIN tk USING (doc_id)) " +
        "SELECT epoch, shard, CAST(start_tok // 256 AS BIGINT) AS pack_id, " +
        "pos, doc_id, n_tokens, start_tok, " +
        "CAST(start_tok % 256 AS BIGINT) AS pack_off FROM c"),
    "training_order" ->
      ("WITH e AS (SELECT doc_id, unnest(generate_series(0, 1)) AS epoch FROM documents), " +
        "s AS (SELECT doc_id, epoch, " +
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard, " +
        "md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS h FROM e) " +
        "SELECT CAST(epoch AS BIGINT) AS epoch, shard, " +
        "CAST(row_number() OVER (PARTITION BY epoch, shard ORDER BY h, doc_id) AS BIGINT) AS pos, " +
        "doc_id FROM s"),
    // quality score + repetition gates composed (shared subquery twins)
    "quality_gated_corpus" ->
      (s"WITH s AS ($textStatsSql), r AS ($repetitionStatsSql) " +
        "SELECT s.doc_id, s.quality_score, r.dup_line_frac, r.top_bigram_frac " +
        "FROM s JOIN r ON s.doc_id = r.doc_id " +
        "WHERE s.quality_score >= 0.45 AND r.dup_line_frac <= 0.3 " +
        "AND r.top_bigram_frac <= 0.2"),
    // C4 line tier, fixture config: split on newline, keep lines with >=30
    // whitespace tokens and no banned substring, drop docs left empty or
    // carrying a page-level ban — every rule plain SQL in both engines
    "line_cleaned_corpus" ->
      ("WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents), " +
        "s AS (SELECT doc_id, t, string_split(t, chr(10)) AS lines FROM d), " +
        "k AS (SELECT doc_id, t, lines, " +
        "list_filter(lines, l -> len(string_split_regex(trim(l), '\\s+')) >= 30 " +
        "AND NOT contains(lower(l), 'javascript')) AS kept FROM s) " +
        "SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines, " +
        "CAST(len(kept) AS BIGINT) AS n_lines_kept, " +
        "array_to_string(kept, chr(10)) AS cleaned_text FROM k " +
        "WHERE len(kept) >= 1 AND NOT contains(lower(t), 'lorem ipsum') " +
        "AND NOT contains(lower(t), '{')"),
    "lang_profile" ->
      ("SELECT lang, count(*) AS n_docs, " +
        "round(avg(len(coalesce(text,''))), 2) AS avg_len, " +
        "round(avg(CASE WHEN len(trim(coalesce(text,''))) = 0 THEN 0 " +
        "ELSE len(string_split_regex(trim(coalesce(text,'')), '\\s+')) END), 2) AS avg_tokens " +
        "FROM documents GROUP BY lang"),
  )
}
