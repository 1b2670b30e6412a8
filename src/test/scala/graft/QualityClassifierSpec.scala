package graft

import graft.ml.QualityClassifier

/** Distilled quality classifier: feature determinism, weak-label gate
  * exactness, fit quality against its teacher, and the coefs→margin
  * replay contract the DuckDB oracle relies on.
  */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  test("features: exact ratios and integer-exact weak label") {
    val docs = Seq(
      (1L, "the cat sat of the mat and it is a cat"), // stopword-heavy
      (2L, "!!!! ???? ,,,, ...."),                    // punct-only
      (3L, null.asInstanceOf[String]),
      (4L, "a" * 600)                                 // saturates f_len
    ).toDF("doc_id", "text")
    val f = QualityClassifier.features(docs)
      .collect().map(r => r.getLong(0) -> r).toMap

    val r1 = f(1L)
    // "the cat sat of the mat and it is a cat": 11 tokens, 6 stopwords
    // (the×2, of, and, is, a)
    assert(r1.getAs[Double]("f_stop") == 6.0 / 11)
    assert(r1.getAs[Double]("f_punct") == 0.0)
    val r2 = f(2L)
    // 16 punct chars over 19 total
    assert(r2.getAs[Double]("f_punct") == 16.0 / 19)
    assert(r2.getAs[Int]("weak_label") == 0)
    val r3 = f(3L)
    assert(r3.getAs[Double]("f_len") == 0.0)
    val r4 = f(4L)
    assert(r4.getAs[Double]("f_len") == 1.0)
    // weak label replay: exact integer gate, no float boundary — check one
    // case by hand: doc 4 is one 600-char token, 0 stopwords, 0 punct →
    // score = 0.5·1 + 0 + 0.2 = 0.7 >= 0.5
    assert(r4.getAs[Int]("weak_label") == 1)
  }

  test("fit distills the heuristic gate; scores/eval/coefs are one model") {
    val scores = QualityClassifier.scoresEntry(spark, sf).persist()
    try {
      val n = scores.count()
      assert(n > 0)
      val agree = scores.filter($"weak_label" === $"predicted").count()
      // the gate is linear in the feature space by construction, so the
      // distilled model must reproduce it almost everywhere
      assert(agree.toDouble / n >= 0.95, s"accuracy ${agree.toDouble / n}")

      // margin replay: recompute from the dumped coefs in the oracle's
      // exact literal order and compare bit-for-bit pre-rounding
      val coefs = QualityClassifier.coefsEntry(spark, sf)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val sample = scores.limit(200).collect()
      sample.foreach { r =>
        val raw = coefs("__intercept") +
          coefs("f_len") * r.getAs[Double]("f_len") +
          coefs("f_stop") * r.getAs[Double]("f_stop") +
          coefs("f_punct") * r.getAs[Double]("f_punct") +
          coefs("f_digit") * r.getAs[Double]("f_digit") +
          coefs("f_wordlen") * r.getAs[Double]("f_wordlen")
        val rounded = BigDecimal.valueOf(raw + 1e-9)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(rounded == r.getAs[Double]("margin"),
          s"doc ${r.getLong(0)}: replay $rounded != ${r.getAs[Double]("margin")}")
        assert((if (raw > 0.0) 1 else 0) == r.getAs[Int]("predicted"))
      }

      // eval rollup partitions the corpus exactly
      val eval = QualityClassifier.evalEntry(spark, sf).collect()
      assert(eval.map(_.getAs[Long]("n_docs")).sum == n)
      // micros sum matches a direct recount
      val direct = scores
        .groupBy($"weak_label", $"predicted")
        .count().collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      eval.foreach { r =>
        assert(direct((r.getInt(0), r.getInt(1))) == r.getAs[Long]("n_docs"))
      }
    } finally scores.unpersist()
  }

  test("standing fit: repeated entries see the same model") {
    val c1 = QualityClassifier.coefsEntry(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val c2 = QualityClassifier.coefsEntry(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(c1 == c2)
    assert(c1.keySet ==
      Set("__intercept", "f_len", "f_stop", "f_punct", "f_digit", "f_wordlen"))
    c1.values.foreach(v => assert(!v.isNaN && !v.isInfinite))
  }
}
