package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The verification harness itself must fail loudly. Round 8's lesson: a
  * catch block that only printed to stderr let 13 broken queries vanish
  * from the correctness artifact — the report showed zero err rows while
  * a fifth of the surface was red. These specs pin the fixed contract:
  * every Verify run writes `_errors.json`, a broken query appears in it
  * by name, and healthy queries still dump.
  */
class VerifyHarnessSpec extends SparkTestBase {

  private def run(queries: Map[String, (SparkSession, String) => DataFrame]) = {
    val out = Files.createTempDirectory("graft-verify-harness").toString
    val errs = Verify.dumpAll(spark, sf, out, queries)
    (out, errs)
  }

  test("a deliberately-broken query lands in _errors.json as an err row") {
    val (out, errs) = run(Map(
      "healthy" -> ((s: SparkSession, dir: String) =>
        graft.sources.Tables.region(s, dir)),
      "broken" -> ((s: SparkSession, _: String) =>
        s.sql("SELECT definitely_not_a_column FROM range(1)"))
    ))
    assert(errs.keySet == Set("broken"))
    // healthy query still dumped parquet
    assert(Files.exists(Paths.get(s"$out/healthy")))
    assert(spark.read.parquet(s"$out/healthy").count() > 0)
    // the artifact names the broken query — driver and humans see an err
    // row, not an absence
    val json = Files.readString(Paths.get(s"$out/_errors.json"))
    assert(json.contains("\"broken\""))
    assert(!json.contains("\"healthy\""))
  }

  test("a clean run writes an empty _errors.json (artifact always present)") {
    val (out, errs) = run(Map(
      "ok" -> ((s: SparkSession, dir: String) =>
        graft.sources.Tables.nation(s, dir))))
    assert(errs.isEmpty)
    assert(Files.readString(Paths.get(s"$out/_errors.json")).trim == "{}")
  }

  test("error payloads with quotes/newlines stay valid JSON") {
    // jsonQuote must survive exception messages containing ", \n, tabs —
    // Spark analysis errors routinely include quoted identifiers and
    // multi-line plans.
    val nasty = "msg with \"quotes\"\nand\tcontrol\rchars \\ backslash"
    val quoted = Verify.jsonQuote(nasty)
    assert(quoted.startsWith("\"") && quoted.endsWith("\""))
    assert(!quoted.drop(1).dropRight(1).exists(c => c < ' '))
    val (_, errs) = run(Map(
      "thrower" -> ((_: SparkSession, _: String) =>
        throw new RuntimeException(nasty))))
    assert(errs("thrower").contains("quotes"))
  }
}
