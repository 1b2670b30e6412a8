package graft

import org.apache.spark.sql.functions._

import graft.operators.NgramLm

/** CCNet-style bigram-LM quality scoring: smoothing arithmetic on crafted
  * counts, the three-level backoff (bigram → context default → global), and
  * reference-language discrimination on the fixture.
  */
class NgramLmSpec extends SparkTestBase {
  import spark.implicits._

  private def micros(x: Double): Long = math.round(math.log(x) * 1e6)

  test("fit: add-one ratios, context defaults, global marker row") {
    val ref = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val m = NgramLm.fit(ref)
    // c(a)=2, c(b)=2, V = 2 vocab + 1 unk = 3
    val bi = m.bigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bi == Map(
      "a b" -> micros(3.0 / 5), // c("a b")=2 → (2+1)/(c(a)+3)
      "b a" -> micros(2.0 / 5))) // c("b a")=1 → (1+1)/(c(b)+3)
    val ctx = m.contexts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ctx == Map(
      "a" -> micros(1.0 / 5),
      "b" -> micros(1.0 / 5),
      ""  -> micros(1.0 / 3))) // global default marker
    assert(m.globalDefMicros == micros(1.0 / 3))
  }

  test("scoreOf: three-level backoff and exact micro sums") {
    val ref = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val m = NgramLm.fit(ref)
    val docs = Seq(
      (10L, "a b a"),  // two seen bigrams
      (11L, "a z"),    // seen context, unseen continuation → default(a)
      (12L, "z a"),    // unseen context → global default
      (13L, "a"),      // single token → no row
      (14L, "")).toDF("doc_id", "text")
    val got = NgramLm.scoreOf(docs, m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set(10L, 11L, 12L))
    assert(got(10L) == (2L, -(micros(3.0 / 5) + micros(2.0 / 5))))
    assert(got(11L) == (1L, -micros(1.0 / 5)))
    assert(got(12L) == (1L, -micros(1.0 / 3)))
    // mean is the micro sum over 1e6·n
    val mean10 = NgramLm.scoreOf(docs, m)
      .filter($"doc_id" === 10L).select($"mean_nll").head.getDouble(0)
    val expect = BigDecimal(
      got(10L)._2.toDouble / 2e6 + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(mean10 - expect) < 1e-9)
  }

  test("reference-language discrimination: en scores best under the en model") {
    val byLang = NgramLm.perplexityScores(spark, sf)
      .join(graft.sources.Tables.documents(spark, sf).select($"doc_id", $"lang"),
        "doc_id")
      .groupBy($"lang").agg(avg($"mean_nll").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val en = byLang("en")
    byLang.filter(_._1 != "en").foreach { case (l, m) =>
      assert(en < m, s"en mean NLL $en not below $l mean $m")
    }
  }
}
