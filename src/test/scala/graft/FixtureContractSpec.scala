package graft

import java.nio.file.Files

import graft.sources.FixtureContract

/** The regen-proofing gate itself: the live fixtures conform, and an
  * intentional schema flip on a scratch fixture yields a single clear
  * diagnostic naming table+column+got+want — the round-8 failure mode
  * (13 scattered DATATYPE_MISMATCH errors from one encoding change)
  * can't recur silently.
  */
class FixtureContractSpec extends SparkTestBase {
  import spark.implicits._

  test("the live fixture dir passes the contract at every scale factor") {
    assert(FixtureContract.check(spark, sf).isEmpty)
  }

  test("an intentional type flip yields one diagnostic naming table+column+got+want") {
    val dir = Files.createTempDirectory("graft-contract").toString
    // scratch 'region' with r_regionkey flipped int32 → string
    Seq(("0", "AFRICA"), ("1", "AMERICA"))
      .toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val diags = FixtureContract.checkTable(spark, dir, "region",
      FixtureContract.expected.toMap.apply("region"))
    assert(diags.size == 1)
    assert(diags.head.contains("table=region"))
    assert(diags.head.contains("column=r_regionkey"))
    assert(diags.head.contains("got=string"))
    assert(diags.head.contains("want"))
  }

  test("a missing column yields a diagnostic that lists what IS there") {
    val dir = Files.createTempDirectory("graft-contract-miss").toString
    Seq((0, "AFRICA")).toDF("r_regionkey", "r_wrong_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val diags = FixtureContract.checkTable(spark, dir, "region",
      FixtureContract.expected.toMap.apply("region"))
    assert(diags.exists(d => d.contains("column=r_name") && d.contains("MISSING")))
  }

  test("an unreadable table is one diagnostic, not an exception") {
    val dir = Files.createTempDirectory("graft-contract-gone").toString
    val diags = FixtureContract.checkTable(spark, dir, "region",
      FixtureContract.expected.toMap.apply("region"))
    assert(diags.size == 1)
    assert(diags.head.contains("unreadable"))
  }
}
