package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.operators.{AsOf, Relational}

/** Plan-shape regression guards: the properties the 100 TB design depends
  * on — filter pushdown reaching the scan, skew guards staying broadcast,
  * temporal joins staying single-shuffle — asserted against the physical
  * plan so a future edit cannot silently regress them. Substring checks on
  * the executed-plan string are deliberately loose (exact operator trees
  * churn across Spark versions; these properties must not).
  */
class PlanShapeSpec extends SparkTestBase {
  import spark.implicits._

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1 predicate is pushed into the parquet scan") {
    val plan = planOf(Relational.q1PricingSummary(spark, sf))
    assert(plan.contains("PushedFilters: ["), plan.take(800))
    assert(plan.contains("LessThanOrEqual(l_shipdate"), plan.take(800))
  }

  test("scans prune to the read columns (no full-width reads)") {
    val plan = planOf(Relational.q3TopRevenue(spark, sf))
    // lineitem has 9+ columns; the q3 scan needs exactly three
    val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toList
    assert(readSchemas.nonEmpty)
    val li = readSchemas.find(_.contains("l_extendedprice")).get
    assert(li.contains("l_orderkey") && li.contains("l_discount"))
    assert(!li.contains("l_comment") && !li.contains("l_shipdate"), li)
  }

  test("the LSH hot-bucket guard is a broadcast anti-join") {
    val docs = (0 until 50).map(i => (i.toLong, s"document number $i with some shared text"))
      .toDF("doc_id", "text")
    val df = graft.operators.Dedup.nearDupPairsOf(docs)
    df.count() // run so AQE finalizes join strategies (hot-key size is a runtime stat)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin LeftAnti") ||
      plan.contains("BroadcastHashJoin [band"), plan.take(1200))
  }

  test("as-of join is one shuffle on the key (no per-row subplans)") {
    val left = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00"), "x"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, Timestamp.valueOf("2023-01-01 00:00:00"), 9L))
      .toDF("k", "t", "v")
    val plan = planOf(AsOf.joinAsOf(left, right, "k", "t", Seq("v")))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("salted join hashes on (key, salt); salted distinct never single-buckets the hot key") {
    val join = planOf(graft.operators.Skew.skewSaltedJoin(spark, sf))
    // the exchanges must carry the salt — that IS the mitigation
    assert("hashpartitioning\\(o_custkey[^)]*_salt".r.findFirstIn(join).isDefined,
      join.take(1500))
    assert(!join.contains("BroadcastHashJoin"), join.take(1500))
    val dist = planOf(graft.operators.Skew.saltedDistinctUsers(spark, sf))
    assert("hashpartitioning\\(event_type[^)]*_salt".r.findFirstIn(dist).isDefined,
      dist.take(1500))
  }

  test("persisted IVF probe prunes the scan to the probed cell directories") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_spec").toString
    Similarity.writeIvfIndex(Similarity.buildIvfIndex(emb, nlist = 8), dir)
    val loaded = Similarity.loadIvfIndex(spark, dir)
    val queries = emb.limit(1).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    // AQE off so the executed plan is inspectable without stage indirection
    // (restore the SAVED value, not a literal — the shared session's base
    // config must survive this suite unchanged)
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Similarity.queryIvfIndex(loaded, queries, k = 5, nprobe = 2)
      val rows = df.collect()
      assert(rows.nonEmpty)
      val scans = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec if f.relation.location.rootPaths
          .exists(_.toString.contains(dir)) => f
      }
      assert(scans.nonEmpty, df.queryExecution.executedPlan.toString.take(1500))
      val scan = scans.head
      // the probe predicate must be a PARTITION filter (directory pruning),
      // not a post-scan data filter
      assert(scan.partitionFilters.mkString(",").contains("cell"),
        scan.partitionFilters.mkString(","))
      // one query × nprobe=2 → exactly 2 of the 8 cell directories read
      val scanned = scan.metrics.get("numPartitions").map(_.value)
      assert(scanned.contains(2L), s"partitions read: $scanned")
      // and the persisted probe returns the same rows as the in-memory index
      val mem = Similarity.queryIvfIndex(
        Similarity.buildIvfIndex(emb, nlist = 8), queries, k = 5, nprobe = 2)
      assert(rows.map(_.toSeq).toSet == mem.collect().map(_.toSeq).toSet)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("dimension joins stay broadcast at fixture scale (q5 fact never shuffles for dims)") {
    val plan = planOf(Relational.q5NationRevenue(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"))
  }

  test("decontamination sweep broadcasts the benchmark grams, never the corpus") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    // AQE off: collect() does not traverse into AdaptiveSparkPlanExec's
    // inner plan (restore the SAVED value, as elsewhere in this suite)
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val df = graft.operators.Decontamination.ngramContamination(spark, sf)
    val plan = df.queryExecution.executedPlan
    // the gram join must be broadcast (BuildRight = the benchmark side) —
    // a shuffle join here would move the entire tokenized corpus
    assert(plan.toString.contains("BroadcastHashJoin"), plan.toString.take(1000))
    // only the benchmark slice's subtree is broadcast: its exchange subtree
    // must carry the % 10 = 0 filter, not the corpus-side complement
    val bcasts = plan.collect { case b: BroadcastExchangeExec => b }
    assert(bcasts.nonEmpty)
    // benchmark filter is EqualTo(doc_id % 10, 0); the corpus complement
    // wraps it in Not. Walk the ACTUAL predicate expressions (FilterExec
    // conditions + scan data filters) rather than string-matching the plan
    // rendering, which churns across Spark versions.
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, Literal, Not, Remainder}
    import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec}
    def predsOf(b: BroadcastExchangeExec): Seq[Expression] = b.collect {
      case f: FilterExec => Seq(f.condition)
      case s: FileSourceScanExec => s.dataFilters
    }.flatten
    def isModEqZero(e: Expression): Boolean = e.exists {
      case EqualTo(r: Remainder, Literal(z, _)) =>
        z == 0 && r.right.isInstanceOf[Literal]
      case _ => false
    }
    assert(bcasts.forall { b =>
      val preds = predsOf(b)
      preds.exists(isModEqZero) &&
        !preds.exists(_.exists(_.isInstanceOf[Not]))
    }, bcasts.map(predsOf(_).mkString("; ").take(300)))
    // the corpus side reaches the join with no shuffle: the only Exchanges
    // are the spread repartition and the final (doc, bench) group-by
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 2, s"unexpected exchanges: ${shuffles.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("PQ scoring broadcasts the query tables; the coded corpus never shuffles for the join") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.{FileSourceScanExec, LocalTableScanExec}
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.operators.Pq.pqAdcTopK(spark, sf).queryExecution.executedPlan
      // the only join condition is the self-exclusion inequality, so the
      // right shape is a nested loop over the BROADCAST query table (a few
      // rows) with the coded corpus streaming — not a hash join, and
      // never a shuffle of the corpus
      assert(plan.toString.contains("BroadcastNestedLoopJoin BuildRight"),
        plan.toString.take(1000))
      // what's broadcast is the driver-built (query_id, dtab) table — a
      // LocalTableScan — never the parquet-backed coded corpus
      val bcasts = plan.collect { case b: BroadcastExchangeExec => b }
      assert(bcasts.nonEmpty)
      assert(bcasts.forall { b =>
        b.exists(_.isInstanceOf[LocalTableScanExec]) &&
          !b.exists(_.isInstanceOf[FileSourceScanExec])
      }, bcasts.map(_.toString.take(300)))
      // corpus-side exchanges: the spread repartition plus the two top-k
      // rank phases (local salted, global) — nothing else
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size <= 3, s"unexpected exchanges: ${shuffles.size}")
      // rerank composition stays broadcast-joined end to end too
      val rplan = planOf(graft.operators.Pq.pqRerankTopK(spark, sf))
      assert(rplan.contains("BroadcastHashJoin"))
      assert(!rplan.contains("CartesianProduct"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("vocab top-K is TakeOrdered (partial heaps), never a global sort") {
    val plan = planOf(graft.operators.TextAnalysis.vocabStats(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    assert(!plan.contains("Exchange rangepartitioning"), plan.take(800))
  }

  test("tfidf broadcasts the vocabulary-sized df table, never shuffles tf for the join") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.operators.TextAnalysis.tfidfTopTerms(spark, sf)
        .queryExecution.executedPlan
      assert(plan.collect { case b: BroadcastExchangeExec => b }.nonEmpty,
        plan.toString.take(1000))
      // tf is localCheckpointed (one corpus shuffle, before this plan), so
      // the visible exchanges are only the vocabulary-sized df agg and the
      // per-doc rank window — a second corpus-scale explode+shuffle of the
      // df branch is exactly what the checkpoint exists to prevent
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size <= 2, s"unexpected exchanges: ${shuffles.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("outlier detection broadcasts the 5-row moment table; events never shuffle") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.operators.EventAnalytics.valueOutliers(spark, sf)
        .queryExecution.executedPlan
      assert(plan.collect { case b: BroadcastExchangeExec => b }.nonEmpty)
      // the only exchange is the moment aggregation itself (under the
      // broadcast); the probe side streams from the scan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size <= 1, s"unexpected exchanges: ${shuffles.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("sequence packing windows on shard: no single-partition funnel anywhere") {
    val plan = planOf(graft.operators.TextAnalysis.packedSequences(spark, sf))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1200))
    assert(plan.contains("Window"), plan.take(400))
  }

  test("dup_spans: positions never shuffle on the gram; map-side partial agg survives") {
    import org.apache.spark.sql.catalyst.expressions.Attribute
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.operators.DupSpans.dupSpans(spark, sf)
        .queryExecution.executedPlan
      // the duplicated-gram probe is broadcast, and the build side is the
      // aggregated gram-count set (carries a HashAggregate), not the corpus
      assert(plan.toString.contains("BroadcastHashJoin"), plan.toString.take(1000))
      val bcasts = plan.collect { case b: BroadcastExchangeExec => b }
      assert(bcasts.nonEmpty &&
        bcasts.forall(_.collect { case h: HashAggregateExec => h }.nonEmpty))
      // hash exchanges: exactly one on the gram hash (the count branch —
      // fed by a partial aggregate, so only 8-byte key + count shuffles)
      // and one on doc_id (the island windows). A second gram exchange
      // would mean the O(total tokens) position stream started shuffling.
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      val keyed = shuffles.flatMap(s => s.outputPartitioning match {
        case h: HashPartitioning =>
          Some(s -> h.expressions.flatMap(_.collect { case a: Attribute => a.name }))
        case _ => None
      })
      val ghSides = keyed.filter(_._2.contains("gh"))
      assert(ghSides.size == 1, s"gram-keyed exchanges: ${ghSides.size}")
      assert(keyed.count(_._2.contains("doc_id")) == 1)
      val belowGh = ghSides.head._1.collect { case h: HashAggregateExec => h }
      assert(belowGh.exists(_.aggregateExpressions.exists(
        _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial)))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("bloom dedup: sketch rides as a subquery, verify joins broadcast, nothing sort-merges") {
    val plan = planOf(graft.operators.Dedup.bloomIncrementalDedup(spark, sf))
    // the corpus sketch is an in-plan subquery stage, not a collected literal
    assert(plan.contains("Subquery") && plan.contains("bloom_filter_agg"),
      plan.take(1500))
    assert(plan.contains("might_contain"), plan.take(1500))
    // candidate semi-join and survivor anti-join both broadcast — neither
    // the corpus nor the batch ever co-shuffles on text_hash
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("block dedup: the duplicated-block probe is a broadcast join") {
    val plan = planOf(graft.operators.DupSpans.blockDedupCorpus(spark, sf))
    // corpus blocks probe the (small by construction) duplicated-block
    // first-owner table in place; only the hash-agg partials and the
    // per-doc rebuild exchange
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("model-scoring probes broadcast: DSIR ratios and LM tables never shuffle the corpus on a token") {
    val dsir = planOf(graft.operators.Dsir.docWeights(spark, sf))
    assert(dsir.contains("BroadcastHashJoin"), dsir.take(2000))
    assert(!dsir.contains("SortMergeJoin"), dsir.take(2000))
    val lm = planOf(graft.operators.NgramLm.perplexityScores(spark, sf))
    assert(lm.contains("BroadcastHashJoin"), lm.take(2000))
    assert(!lm.contains("SortMergeJoin"), lm.take(2000))
  }

  test("no registered query plans a cartesian product; nested-loop joins only where whitelisted") {
    // BNLJ is legitimate ONLY where the build side is query-sized by
    // design (a handful of broadcast query vectors scored against the
    // corpus); everywhere else a nested-loop or cartesian join is a
    // 100 TB scale-killer this guard exists to catch at review time.
    // Extending the whitelist is a deliberate act, not a test fix.
    val bnljByDesign = Set("cosine_topk", "embedding_near_dup_scale",
      "pq_adc_topk", "pq_adc_topk_indexed", "pq_rerank_topk",
      "retrieval_label_precision",
      // cosine_topk's scorer with the label inequality in the join
      // condition — same query-sized broadcast build side
      "hard_negatives",
      // embeds cosine_topk's query-sized broadcast scorer as its
      // semantic leg; the lexical leg and the fusion are equi-joins
      "hybrid_rrf_topk",
      // the document-fetch composition embeds cosine_topk's query-sized
      // broadcast scorer; the fetch itself is a broadcast-hash equi-join
      "semantic_search_docs",
      // one cosine_topk-shaped scorer per truncation dim — every leg has
      // the same query-sized broadcast build side
      "matryoshka_recall",
      // benchmark-sized broadcast build (eval suites are small by
      // definition — the same contract as the n-gram sweep's broadcast)
      "semantic_contamination",
      // SQ8 compressed-domain scorers: same contract as the PQ family —
      // the build side is the handful of broadcast query codes, the
      // coded corpus streams through without shuffling; the _indexed form
      // is the identical scorer over the persisted codes (the
      // pq_adc_topk_indexed precedent — layout change, same build side)
      "sq_adc_topk", "sq_adc_topk_indexed", "sq_rerank_topk",
      // the exact-baseline leg is cosine_topk's query-sized broadcast
      // scorer; the probed legs are equi-joins on the assignment dumps
      "ivf_recall_curve",
      // same shape as ivf_recall_curve: the exact squared-L2 baseline leg
      // is a query-sized broadcast build against the corpus; both
      // approximate legs are cell-pruned broadcast-hash equi-joins
      "pq_residual_recall",
      // the broadcast build side is the nEpochs-row quality-threshold
      // table (3 rows) joined on qm >= thr — epoch-count-sized by
      // construction, the corpus side streams through unshuffled
      "curriculum_order",
      // embeds curriculum_order as its selection stage — the same 3-row
      // threshold broadcast; the token join and the packing window it
      // adds are equi-keyed
      "training_manifest")
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product")
      if (!bnljByDesign(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join outside the whitelist")
    }
  }
}
