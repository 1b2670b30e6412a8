package graft

import org.apache.spark.sql.functions._

import graft.operators.Decontamination

/** Benchmark decontamination (builder-brief north star): token n-gram
  * windowing edge cases and the corpus×benchmark shared-gram sweep.
  */
class DecontaminationSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenNgrams: rolling windows, dedup, short/blank/null safety") {
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b a b a b"), // repeated windows deduplicate
      (3L, "a b"),         // shorter than n — no descending-sequence trap
      (4L, "   "),
      (5L, null.asInstanceOf[String]),
      (6L, "a  b\tc   d")) // runs of whitespace are one separator
      .toDF("doc_id", "text")
      .select($"doc_id", Decontamination.tokenNgrams($"text", 3).as("g"))
    val m = df.as[(Long, Seq[String])].collect().toMap
    assert(m(1L) == Seq("a b c", "b c d"))
    assert(m(2L) == Seq("a b a", "b a b"))
    assert(m(3L) == Seq.empty)
    assert(m(4L) == Seq.empty)
    assert(m(5L) == Seq.empty)
    assert(m(6L) == Seq("a b c", "b c d"))
  }

  test("contaminationPairs: n-token run hit, (n-1)-token near-miss, counts") {
    val bench = Seq((900L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      // contains the full 4-token benchmark run AND its two 3-suffix windows
      (1L, "x alpha beta gamma delta y"),
      // shares only a 3-token run — invisible at n=4
      (2L, "alpha beta gamma OTHER tail words"),
      (3L, "nothing in common at all")).toDF("doc_id", "text")
    val at4 = Decontamination.contaminationPairsOf(corpus, bench, n = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(at4 == Set((1L, 900L, 1L))) // exactly the 4-gram "alpha beta gamma delta"
    val at3 = Decontamination.contaminationPairsOf(corpus, bench, n = 3)
      .as[(Long, Long, Long)].collect().toSet
    // doc 1 shares both benchmark 3-grams, doc 2 the first one only
    assert(at3 == Set((1L, 900L, 2L), (2L, 900L, 1L)))
    // minOverlap raises the evidence bar
    val strict = Decontamination.contaminationPairsOf(corpus, bench, n = 3,
      minOverlap = 2).as[(Long, Long, Long)].collect().toSet
    assert(strict == Set((1L, 900L, 2L)))
  }

  test("oversized benchmark side switches to the hashed-gram path, same hits") {
    // a benchmark slice big enough to cross a tiny threshold: the fixture's
    // benchmark docs explode to well over 10 grams
    val docs = graft.sources.Tables.documents(spark, sf)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val bench = docs.filter($"doc_id" % 10 === 0)
    val hashed = Decontamination.contaminationPairsOf(corpus, bench,
      maxBroadcastGrams = 10)
    val exact = Decontamination.contaminationPairsOf(corpus, bench)
    assert(hashed.as[(Long, Long, Long)].collect().toSet ==
      exact.as[(Long, Long, Long)].collect().toSet)
    assert(exact.count() > 0)
    // the guard changes the KEY, not the topology: the benchmark side is
    // still the broadcast build side
    assert(hashed.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    // and the hashed plan joins on the 64-bit hash, not the strings
    assert(hashed.queryExecution.optimizedPlan.toString.contains("xxhash64"))
    assert(!exact.queryExecution.optimizedPlan.toString.contains("xxhash64"))
  }

  test("prepared benchmark: same pairs as the one-shot sweep, exact and hashed, cached once") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val bench = docs.filter($"doc_id" % 10 === 0)
    val expected = Decontamination.contaminationPairsOf(corpus, bench)
      .as[(Long, Long, Long)].collect().toSet
    val prepared = Decontamination.prepareBenchmark(bench)
    try {
      // the standing side is materialized up front — repeated sweeps
      // (micro-batches) read the cache, not the explode
      assert(prepared.grams.storageLevel.useMemory)
      assert(!prepared.hashed)
      val got = Decontamination.contaminationPairsPrepared(corpus, prepared)
      assert(got.as[(Long, Long, Long)].collect().toSet == expected)
      // benchmark still the broadcast build side
      assert(got.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
    } finally prepared.unpersist()
    val hashedPrep = Decontamination.prepareBenchmark(bench,
      maxBroadcastGrams = 10)
    try {
      assert(hashedPrep.hashed)
      val got = Decontamination
        .contaminationPairsPrepared(corpus, hashedPrep)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected)
    } finally hashedPrep.unpersist()
    assert(expected.nonEmpty)
  }

  test("ngramContamination sweeps the fixture and equals brute force") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val got = Decontamination.ngramContamination(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    val grams = docs.select($"doc_id",
      Decontamination.tokenNgrams($"text", 8).as("g"))
    val brute = grams.filter($"doc_id" % 10 =!= 0).as("c")
      .join(grams.filter($"doc_id" % 10 === 0).as("b"),
        size(array_intersect(col("c.g"), col("b.g"))) >= 1)
      .select(col("c.doc_id"), col("b.doc_id"),
        size(array_intersect(col("c.g"), col("b.g"))).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute)
    assert(got.nonEmpty) // the fixture's dup families do leak 8-token runs
  }

  test("splitLeakage: rollup equals the pairwise sweep over the same bands") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text",
        graft.operators.Sampling.holdoutSplit($"doc_id", 0.05, 0.05).as("split"))
    val pairs = Decontamination.contaminationPairsOf(
      docs.filter($"split" === "train").select($"doc_id", $"text"),
      docs.filter($"split" === "test").select($"doc_id", $"text"))
      .as[(Long, Long, Long)].collect()
    val row = Decontamination.splitLeakage(spark, sf).collect().head
    assert(row.getAs[Long]("n_leak_pairs") == pairs.length.toLong)
    assert(row.getAs[Long]("n_train_docs") == pairs.map(_._1).distinct.length.toLong)
    assert(row.getAs[Long]("n_test_docs") == pairs.map(_._2).distinct.length.toLong)
    assert(row.getAs[Long]("n_shared_grams") == pairs.map(_._3).sum)
    // the fixture's dup families do cross the split boundary
    assert(row.getAs[Long]("n_leak_pairs") >= 1)
  }

  test("semanticContamination: threshold gate, hit counts, max, null safety") {
    // unit-ish crafted vectors: cosine against bench [1,0,0,0] is just x(0)
    // for unit corpus vectors
    val bench = Seq(
      (900L, Seq(1f, 0f, 0f, 0f)),
      (901L, Seq(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),       // cos 1.0 with 900, 0 with 901
      (2L, Seq(0.8f, 0.6f, 0f, 0f)),   // cos 0.8 with 900, 0.6 with 901
      (3L, Seq(0f, 0f, 1f, 0f)),       // orthogonal to both
      (4L, null.asInstanceOf[Seq[Float]])) // dropped, not an error
      .toDF("vec_id", "embedding")
    val byVec = Decontamination.semanticContaminationOf(corpus, bench, 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byVec.keySet == Set(1L, 2L)) // 3 orthogonal, 4 null
    assert(byVec(1L) == (1L, 1.0))
    assert(byVec(2L) == (2L, 0.8)) // both benchmark vecs hit; max is 0.8
  }

  test("semanticContamination fixture entry: subset of the brute-force sweep") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val brute = emb.filter($"vec_id" % 10 =!= 0).as("c")
      .crossJoin(emb.filter($"vec_id" % 10 === 0)
        .select($"vec_id".as("b_id"), $"embedding".as("b_emb")))
      .withColumn("cos",
        round(graft.operators.Similarity.cosine($"embedding", $"b_emb"), 6))
      .filter($"cos" >= 0.35)
      .groupBy($"vec_id")
      .agg(count(lit(1)).as("n"), max($"cos").as("m"))
      .as[(Long, Long, Double)].collect().toSet
    val got = Decontamination.semanticContamination(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == brute)
    assert(got.nonEmpty)
  }
}
