package graft

import graft.operators.{EventAnalytics, Profile}

/** Dataset profiling + exact-arithmetic outlier detection: both
  * cross-checked against independent driver-side recomputation.
  */
class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("documentsProfile matches direct per-column recomputation") {
    val rows = Profile.documentsProfile(spark, sf).collect()
      .map(r => r.getAs[String]("column") ->
        (r.getAs[Long]("n_nulls"), r.getAs[Long]("n_distinct"),
          r.getAs[String]("min_value"), r.getAs[String]("max_value"))).toMap
    assert(rows.keySet == Set("doc_id", "text", "lang", "source", "n_chars"))
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"n_chars").collect()
    val ids = docs.map(_.getAs[Long]("doc_id"))
    assert(rows("doc_id") ==
      ((0L, ids.distinct.length.toLong, ids.min.toString, ids.max.toString)))
    val langs = docs.map(_.getAs[String]("lang")).filter(_ != null)
    assert(rows("lang")._2 == langs.distinct.length.toLong)
    assert(rows("lang")._1 == (docs.length - langs.length).toLong)
    assert(rows("n_chars")._3.toLong == docs.map(_.getAs[Long]("n_chars")).min)
  }

  test("valueOutliers equals the driver-side integer z-test, and is 3-sigma-sane") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"event_type", $"value")
      .collect().map(r => (r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[Double]("value")))
    // independent recomputation in BigInt (no precision ceiling at all)
    val expected = ev.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val cs = rows.map(r => BigInt(math.round(r._3 * 100)))
      val n = BigInt(cs.length)
      val s = cs.sum
      val q = cs.map(c => c * c).sum
      rows.zip(cs).collect {
        case (r, c) if (n * c - s).pow(2) > 9 * (n * q - s * s) => r._1
      }
    }.toSet
    val got = EventAnalytics.valueOutliers(spark, sf)
      .collect().map(_.getAs[Long]("event_id")).toSet
    assert(got == expected)
    assert(got.nonEmpty, "exponential-tailed fixture must have 3-sigma outliers")
    assert(got.size < ev.length / 20, "3-sigma should flag well under 5%")
  }
}
