package graft

import graft.operators.{Dedup, Pipelines}

/** Composed corpus-build pipelines: the combination rules hold exactly
  * against their constituent operators on the fixture corpus (the DuckDB
  * oracle checks the same queries value-for-value at sf0.01).
  */
class PipelinesSpec extends SparkTestBase {
  import spark.implicits._

  test("nearDedupCorpus = exact-dedup keeps minus near-dup b-sides") {
    val res = Pipelines.nearDedupCorpus(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val keeps = Dedup.exactDedup(spark, sf)
      .select($"keep_doc_id").as[Long].collect().toSet
    val bSides = Dedup.nearDupPairs(spark, sf)
      .select($"b_doc_id").as[Long].collect().toSet
    assert(res == keeps -- bSides)
    assert(res.nonEmpty)
    // the pass actually removes something on this fixture — exact families
    // and/or near-dups exist, otherwise the test proves nothing
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(res.size < total)
  }

  test("cleanCorpus rows satisfy every gate it composes") {
    val rows = Pipelines.cleanCorpus(spark, sf)
      .as[(Long, String, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, lang, q) => lang == "en" && q >= 0.45 })
    val keeps = Dedup.exactDedup(spark, sf)
      .select($"keep_doc_id").as[Long].collect().toSet
    assert(rows.map(_._1).toSet.subsetOf(keeps))
  }

  test("qualityGatedCorpus rows satisfy both gate families") {
    val rows = Pipelines.qualityGatedCorpus(spark, sf)
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, q, dl, tb) =>
      assert(q >= 0.45 && dl <= 0.3 && tb <= 0.2)
    }
    // never more rows than the score gate alone admits
    val qualityOnly = graft.operators.TextAnalysis.textStats(spark, sf)
      .filter($"quality_score" >= 0.45).count()
    assert(rows.length <= qualityOnly)
    // the fixture's synthetic docs are repetition-free, so demonstrate the
    // repetition gates' bite on crafted boilerplate: both signals must land
    // beyond their default thresholds
    val boiler = Array.fill(10)("click here to subscribe now").mkString("\n")
    val sig = Seq(boiler).toDF("text")
      .select(graft.functions.TextExpressions.repetitionStats($"text", 2))
      .as[Seq[Double]].head()
    assert(sig(0) > 0.3, s"dup_line_frac ${sig(0)} must exceed the gate")
    assert(sig(2) > 0.2, s"top_bigram_frac ${sig(2)} must exceed the gate")
  }

  test("ingestedCorpus: batch slice gated by every drop set it composes") {
    val ids = Pipelines.ingestedCorpus(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids.nonEmpty)
    assert(ids.forall(_ % 10 == 1), "only batch docs are emitted")
    val docs = graft.sources.Tables.documents(spark, sf)
    val batch = docs.filter($"doc_id" % 10 === 1)
    val standing = docs.filter($"doc_id" % 10 =!= 0 && $"doc_id" % 10 =!= 1)
    val benchmark = docs.filter($"doc_id" % 10 === 0)
    // exact-dedup canonical keeps within the batch
    val keeps = Dedup.exactDedupOf(batch)
      .select($"keep_doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(keeps))
    // no surviving doc near-dups the standing corpus (index = in-plan here)
    val corpusDrops = Dedup.incrementalNearDupOf(standing, batch)
      .select($"new_doc_id").as[Long].collect().toSet
    assert(ids.intersect(corpusDrops).isEmpty)
    // ... nor another batch doc, nor the benchmark slice's 8-gram runs
    val inBatchDrops = Dedup.nearDupPairsOf(batch)
      .select($"b_doc_id").as[Long].collect().toSet
    assert(ids.intersect(inBatchDrops).isEmpty)
    val contaminated = graft.operators.Decontamination
      .contaminationPairsOf(batch, benchmark)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids.intersect(contaminated).isEmpty)
    // the standing-corpus gate actually bites on this fixture — otherwise
    // the composition's distinctive stage proves nothing
    assert(corpusDrops.nonEmpty)
    spark.sql("DROP TABLE IF EXISTS graft_ingest_band_index__root_testdata_sf0_001")
  }

  test("decontaminatedCorpus: dedup slice minus benchmark and contamination") {
    val ids = Pipelines.decontaminatedCorpus(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids.nonEmpty)
    // subset of the dedup chain, with the benchmark slice gone
    val deduped = Pipelines.nearDedupCorpus(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(deduped))
    assert(ids.forall(_ % 10 != 0))
    // and no contaminated doc survives
    val contaminated = graft.operators.Decontamination
      .ngramContamination(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids.intersect(contaminated).isEmpty)
    // the sweep actually removed something beyond the benchmark slice,
    // otherwise the composition proves nothing on this fixture
    assert(ids.size < deduped.count(_ % 10 != 0))
  }

  test("curationDecisions: verdicts partition the trainable slice and agree with the release chain") {
    val decisions = Pipelines.curationDecisions(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // every trainable doc gets exactly one verdict
    val trainable = graft.sources.Tables.documents(spark, sf)
      .filter($"doc_id" % 10 =!= 0).select($"doc_id").as[Long].collect().toSet
    assert(decisions.keySet == trainable)
    // the shipping+review set IS the decontaminated chain's survivor set
    val surviving = decisions.collect {
      case (id, v) if v == "keep" || v == "review_low_quality" => id }.toSet
    val chain = Pipelines.decontaminatedCorpus(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    assert(surviving == chain)
    // the fixture exercises more than one verdict class
    assert(decisions.values.toSet.size >= 3, decisions.values.toSet.toString)
  }
}
