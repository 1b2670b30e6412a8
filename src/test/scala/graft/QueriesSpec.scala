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
}
