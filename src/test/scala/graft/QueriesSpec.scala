package graft

/** Smoke: every SparkEntry query runs at sf0.001 and is deterministic
  * across two executions (required by the hash-compare gate). */
class QueriesSpec extends SparkTestBase {

  // queries whose correct result may legitimately be empty at tiny SF
  private val mayBeEmpty = Set("customers_without_orders")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and is deterministic at sf0.001") {
      val a = fn(spark, sf)
      val n = a.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      val rows1 = fn(spark, sf).collect().map(_.toString).toSeq
      val rows2 = fn(spark, sf).collect().map(_.toString).toSeq
      assert(rows1 == rows2, s"$name is nondeterministic")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("approx distinct counts track the exact anchor within HLL tolerance") {
    def byFlag(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
      df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = byFlag(graft.operators.Relational.distinctParts(spark, sf))
    val approx = byFlag(graft.operators.Relational.distinctPartsApprox(spark, sf))
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (flag, (ep, es)) =>
      val (ap, as_) = approx(flag)
      // rsd 0.02 → 5σ band of 10%
      assert(math.abs(ap - ep) <= 0.1 * ep + 1, s"$flag parts: $ap vs $ep")
      assert(math.abs(as_ - es) <= 0.1 * es + 1, s"$flag supps: $as_ vs $es")
    }
  }

  test("approx quantiles track the exact anchor within sketch tolerance") {
    // approx_percentile returns an actual data value (no interpolation), so
    // it can differ from the exact interpolated form by up to one local
    // value gap; with ~200 values per group a 5% relative band is generous
    // without being vacuous
    def byType(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Double]] =
      df.collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val exact = byType(graft.operators.EventAnalytics.valueQuantiles(spark, sf))
    val approx = byType(graft.operators.EventAnalytics.valueQuantilesApprox(spark, sf))
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (t, es) =>
      es.zip(approx(t)).foreach { case (e, a) =>
        assert(math.abs(e - a) <= 0.05 * (math.abs(e) + 1.0),
          s"$t: approx $a vs exact $e")
      }
    }
  }
}
