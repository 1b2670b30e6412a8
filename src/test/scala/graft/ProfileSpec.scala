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

  test("corpusDiff classifies all four statuses correctly") {
    val old_ = Seq((1L, "same"), (2L, "will change"), (3L, "will be removed"))
      .toDF("doc_id", "text")
    val new_ = Seq((1L, "same"), (2L, "changed!"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val got = Profile.corpusDiff(old_, new_).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    // the registered fixture diff: removed = %7 ids, changed = planted ids,
    // everything else unchanged, nothing added (shared id space)
    val fix = Profile.documentsDiff(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(fix.size == 500)
    fix.foreach { case (id, st) =>
      val expected =
        if (id % 7 == 0) "removed"
        else if (id % 3 == 0 || id % 5 == 0 || id % 11 == 0) "changed"
        else "unchanged"
      assert(st == expected, s"doc $id: $st != $expected")
    }
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
