package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.operators.{AsOf, Relational}

/** Plan-shape regression guards: the properties the 100 TB design depends
  * on — filter pushdown reaching the scan, skew guards staying broadcast,
  * temporal joins staying single-shuffle — asserted against the physical
  * plan so a future edit cannot silently regress them. Substring checks on
  * the executed-plan string are deliberately loose (exact operator trees
  * churn across Spark versions; these properties must not).
  */
class PlanShapeSpec extends SparkTestBase {
  import spark.implicits._

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1 predicate is pushed into the parquet scan") {
    val plan = planOf(Relational.q1PricingSummary(spark, sf))
    assert(plan.contains("PushedFilters: ["), plan.take(800))
    assert(plan.contains("LessThanOrEqual(l_shipdate"), plan.take(800))
  }

  test("scans prune to the read columns (no full-width reads)") {
    val plan = planOf(Relational.q3TopRevenue(spark, sf))
    // lineitem has 9+ columns; the q3 scan needs exactly three
    val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toList
    assert(readSchemas.nonEmpty)
    val li = readSchemas.find(_.contains("l_extendedprice")).get
    assert(li.contains("l_orderkey") && li.contains("l_discount"))
    assert(!li.contains("l_comment") && !li.contains("l_shipdate"), li)
  }

  test("the LSH hot-bucket guard is a broadcast anti-join") {
    val docs = (0 until 50).map(i => (i.toLong, s"document number $i with some shared text"))
      .toDF("doc_id", "text")
    val df = graft.operators.Dedup.nearDupPairsOf(docs)
    df.count() // run so AQE finalizes join strategies (hot-key size is a runtime stat)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin LeftAnti") ||
      plan.contains("BroadcastHashJoin [band"), plan.take(1200))
  }

  test("as-of join is one shuffle on the key (no per-row subplans)") {
    val left = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00"), "x"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, Timestamp.valueOf("2023-01-01 00:00:00"), 9L))
      .toDF("k", "t", "v")
    val plan = planOf(AsOf.joinAsOf(left, right, "k", "t", Seq("v")))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("dimension joins stay broadcast at fixture scale (q5 fact never shuffles for dims)") {
    val plan = planOf(Relational.q5NationRevenue(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"))
  }
}
