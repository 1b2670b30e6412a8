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

  test("sourceCurationReport: counts match direct recomputation") {
    import graft.operators.{Decontamination, Dedup, Profile}
    val report = Profile.sourceCurationReport(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // totals partition the corpus
    assert(report.values.map(_.getAs[Long]("n_docs")).sum == docs.length)
    // exact-dup count: docs minus per-source keepers of the GLOBAL dedup
    val keepers = Dedup.exactDedupOf(
      graft.sources.Tables.documents(spark, sf))
      .select($"keep_doc_id").as[Long].collect().toSet
    val bySource = docs.groupBy(_._2)
    bySource.foreach { case (src, ds) =>
      val expectDups = ds.count(d => !keepers.contains(d._1))
      assert(report(src).getAs[Long]("n_exact_dup_docs") == expectDups,
        s"$src dup count")
    }
    // contamination count: distinct flagged docs per source
    val contam = Decontamination.ngramContamination(spark, sf)
      .select($"doc_id").distinct().as[Long].collect().toSet
    bySource.foreach { case (src, ds) =>
      val expect = ds.count(d => contam.contains(d._1))
      assert(report(src).getAs[Long]("n_contaminated_docs") == expect,
        s"$src contamination count")
    }
  }

  test("embeddingProfile: exact norms, zero/NaN/ragged-dim detection") {
    import graft.operators.Profile
    val crafted = Seq(
      (0, Array(3f, 4f)),                    // norm 5
      (0, Array(0f, 0f)),                    // zero vector
      (1, Array(1f, 0f, 0f)),                // ragged dim within label 1
      (1, Array(Float.NaN, 1f)),             // NaN vector, norm NaN-ish
      (1, Array(6f, 8f))                     // norm 10
    ).toDF("label", "embedding")
    val out = Profile.embeddingProfileOf(crafted)
      .collect().map(r => r.getInt(0) -> r).toMap
    val l0 = out(0)
    assert(l0.getAs[Long]("n_vecs") == 2)
    assert(l0.getAs[Long]("min_dim") == 2 && l0.getAs[Long]("max_dim") == 2)
    assert(l0.getAs[Long]("n_zero") == 1)
    assert(l0.getAs[Long]("n_nan") == 0)
    assert(l0.getAs[Double]("max_norm") == 5.0)
    val l1 = out(1)
    assert(l1.getAs[Long]("n_vecs") == 3)
    assert(l1.getAs[Long]("min_dim") == 2 && l1.getAs[Long]("max_dim") == 3)
    assert(l1.getAs[Long]("n_nan") == 1)
    // the NaN vector's norm is NULL by contract → max sees only finite norms
    assert(l1.getAs[Double]("max_norm") == 10.0)
    // fixture entry: every vector is 64-dim, clean, norms positive
    val fix = Profile.embeddingProfile(spark, sf).collect()
    assert(fix.nonEmpty)
    fix.foreach { r =>
      assert(r.getAs[Long]("min_dim") == 64L && r.getAs[Long]("max_dim") == 64L)
      assert(r.getAs[Long]("n_zero") == 0 && r.getAs[Long]("n_nan") == 0)
      assert(r.getAs[Double]("min_norm") > 0)
      assert(r.getAs[Long]("sum_norm_micros") > 0)
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

  test("vocabDrift equals a driver-side recomputation of the smoothed KL contributions") {
    val got = Profile.vocabDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", graft.operators.TextAnalysis.tokens($"text"))
      .as[(Long, Seq[String])].collect()
    val counts = scala.collection.mutable.Map.empty[String, (Long, Long)]
    docs.foreach { case (id, toks) =>
      val inBatch = id % 10 == 1
      toks.foreach { t =>
        val (b, c) = counts.getOrElse(t, (0L, 0L))
        counts(t) = if (inBatch) (b + 1, c) else (b, c + 1)
      }
    }
    val tB = counts.values.map(_._1).sum
    val tC = counts.values.map(_._2).sum
    val v = counts.size.toLong
    val expect = counts.toSeq.map { case (t, (b, c)) =>
      val lnM = math.round(math.log(((b + 1) * (tC + v)).toDouble /
        ((c + 1) * (tB + v)).toDouble) * 1e6)
      (t, b, c, math.round((b + 1) * lnM / (tB + v).toDouble))
    }.sortBy { case (t, _, _, d) => (-math.abs(d), t) }.take(20)
    assert(got.toSeq == expect)
  }
}
