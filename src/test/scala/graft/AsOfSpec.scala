package graft

import java.sql.Timestamp

import graft.operators.AsOf

/** As-of join semantics: strictly-earlier bound, per-key isolation,
  * no-match nulls, and latest-wins among multiple earlier right rows.
  * The fixture-scale value check is the DuckDB native ASOF JOIN oracle
  * (SparkEntry "last_purchase_asof").
  */
class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("joinAsOf: strict bound, latest-wins, per-key, null when no prior") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"), // two earlier rights → latest wins
      (1L, ts("2024-01-01 09:00:00"), "b"), // equal-time right must NOT match
      (1L, ts("2024-01-01 08:00:00"), "c"), // before any right → null
      (2L, ts("2024-01-01 12:00:00"), "d")  // other key: only its own rights
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 09:30:00"), 200L),
      (2L, ts("2024-01-01 11:00:00"), 300L)
    ).toDF("k", "t", "v")

    val out = AsOf.joinAsOf(left, right, key = "k", time = "t",
      payload = Seq("v"))
      .select($"tag", $"v", $"asof_time")
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2))))
      .toSet
    assert(out == Set(
      ("a", Some(200L), Some(ts("2024-01-01 09:30:00"))),
      ("b", None, None), // 09:00 right is equal-time, excluded by strict >
      ("c", None, None),
      ("d", Some(300L), Some(ts("2024-01-01 11:00:00")))))
  }

  test("joinAsOf: a NULL right timestamp matches nothing (not everything)") {
    // nulls sort first in the carry-forward window, so an unfiltered NULL
    // right row would be treated as earlier-than-any-left — DuckDB's ASOF
    // strict bound gives it no matches, the semantics pinned here
    val left = Seq((1L, ts("2024-01-01 00:00:00"), "x")).toDF("k", "t", "tag")
    val right = Seq((1L, null.asInstanceOf[Timestamp], 7L)).toDF("k", "t", "v")
    val out = AsOf.joinAsOf(left, right, "k", "t", Seq("v"))
      .select($"tag", $"v").collect().map(r => (r.getString(0), Option(r.get(1))))
    assert(out.toSeq == Seq(("x", None)))
  }

  test("joinAsOf rejects payload names that collide with left columns") {
    val left = Seq((1L, ts("2024-01-01 00:00:00"), "x")).toDF("k", "t", "v")
    val right = Seq((1L, ts("2023-01-01 00:00:00"), 1L)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      AsOf.joinAsOf(left, right, "k", "t", Seq("v"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("joinAsOf keeps every left row and all left columns") {
    val left = Seq((1L, ts("2024-01-01 00:00:00"), "x", 3.5))
      .toDF("k", "t", "s", "extra")
    val right = Seq((9L, ts("2023-01-01 00:00:00"), 1L)).toDF("k", "t", "v")
    val out = AsOf.joinAsOf(left, right, "k", "t", Seq("v"))
    assert(out.columns.toSeq == Seq("k", "t", "s", "extra", "asof_time", "v"))
    assert(out.count() == 1)
  }
}
