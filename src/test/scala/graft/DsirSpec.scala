package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance weighting (Xie et al. 2023, relational form): feature
  * counts, smoothing arithmetic, weight exactness, and the selection's
  * discrimination on the fixture's language-tagged corpus.
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenRatios: counts, smoothing signs, micros quantization") {
    val docs = Seq(
      (1L, "a a b", true),
      (2L, "a c c c", false)).toDF("doc_id", "text", "is_t")
    val got2 = Dsir.tokenRatiosOf(docs, $"is_t")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // T_target=3, T_raw=4, V=3
    assert(got2("a")._1 == 2L && got2("a")._2 == 1L)
    assert(got2("b")._1 == 1L && got2("b")._2 == 0L)
    assert(got2("c")._1 == 0L && got2("c")._2 == 3L)
    // exact micros: ln((cnt_t+1)/6) − ln((cnt_r+1)/7), rounded
    def micros(t: Long, r: Long): Long =
      math.round((math.log((t + 1).toDouble / 6) -
        math.log((r + 1).toDouble / 7)) * 1e6)
    assert(got2("a")._3 == micros(2, 1))
    assert(got2("b")._3 == micros(1, 0)) // target-only token: positive
    assert(got2("c")._3 == micros(0, 3)) // raw-only token: negative
    assert(got2("b")._3 > 0 && got2("c")._3 < 0)
  }

  test("docWeights: exact BIGINT dot product against a driver recompute") {
    val ratios = Dsir.tokenRatios(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val expected = docs.flatMap { case (id, text) =>
      val toks = Option(text).map(_.trim).filter(_.nonEmpty)
        .map(_.split("[ \\t\\n\\r\\f]+").toSeq).getOrElse(Seq.empty)
      if (toks.isEmpty) None
      else Some(id -> (toks.size.toLong, toks.map(ratios).sum))
    }.toMap
    val got = Dsir.docWeights(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("selection discriminates: target-language docs out-weigh every other language") {
    val byLang = Dsir.docWeights(spark, sf)
      .join(graft.sources.Tables.documents(spark, sf).select($"doc_id", $"lang"),
        "doc_id")
      .groupBy($"lang")
      .agg(avg($"weight_micros").as("mean_w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val fr = byLang("fr")
    byLang.filter(_._1 != "fr").foreach { case (l, w) =>
      assert(fr > w, s"fr mean $fr not above $l mean $w")
    }
    // and the ranking's head is strongly fr-ENRICHED vs the base rate (the
    // synthetic langs share one vocabulary, so non-fr docs can carry
    // fr-leaning token mixes — enrichment, not purity, is the guarantee)
    val docs = graft.sources.Tables.documents(spark, sf)
    val topLangs = Dsir.topWeighted(spark, sf, k = 20)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .select($"lang").as[String].collect()
    val frTop = topLangs.count(_ == "fr").toDouble / topLangs.length
    val frBase = docs.filter($"lang" === "fr").count().toDouble / docs.count()
    assert(frTop >= 2 * frBase, s"top-20 fr share $frTop < 2x base $frBase")
  }
}
