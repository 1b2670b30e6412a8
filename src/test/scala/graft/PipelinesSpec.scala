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
}
