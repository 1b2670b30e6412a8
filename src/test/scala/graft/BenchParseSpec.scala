package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins the stall-detection input parse in [[Bench.bestPriorTimes]] against
  * the driver's actual BENCH_r{N}.json shape: a raw escaped "tail" string
  * (whose times must NOT match — they may be a different run) followed by a
  * pretty-printed "parsed" object with whitespace after the colon. A silent
  * parse-to-empty here disables stall detection without any visible failure,
  * which is exactly how the round-7 regex bug shipped in the first draft.
  */
class BenchParseSpec extends AnyFunSuite {

  private val artifact =
    """{
      |  "n": 6,
      |  "tail": "{\"metric\":\"total\",\"queries\":{\"q_alpha\":9.99,\"q_beta\":9.99},\"sf\":\"/data/sf0.1\"}",
      |  "parsed": {
      |    "metric": "total",
      |    "value": 3.5,
      |    "queries": {
      |      "q_alpha": 1.25,
      |      "q_beta": 2.25,
      |      "q_failed": -1.0
      |    },
      |    "sf": "/data/sf0.1"
      |  }
      |}""".stripMargin

  test("bestPriorTimes reads the parsed section, skips the tail and failures") {
    val dir = Files.createTempDirectory("graft-benchparse")
    dir.toFile.deleteOnExit()
    Files.writeString(dir.resolve("BENCH_r06.json"), artifact)
    // a second round with a worse alpha and a better beta: min must win per query
    Files.writeString(dir.resolve("BENCH_r05.json"),
      artifact.replace("1.25", "5.0").replace("2.25", "0.5"))
    // non-matching files must be ignored
    Files.writeString(dir.resolve("bench_last.json"), artifact.replace("1.25", "0.01"))

    val names = Seq("q_alpha", "q_beta", "q_failed", "q_absent")
    val best = Bench.bestPriorTimes(dir.toFile, names, "/data/sf0.1")
    assert(best("q_alpha") == 1.25) // min across rounds, NOT the tail's 9.99
    assert(best("q_beta") == 0.5)
    assert(!best.contains("q_failed")) // -1 failure markers are not baselines
    assert(!best.contains("q_absent"))
    // a run at a DIFFERENT sf must see no baselines at all — a dev run at
    // sf0.01 is not judged against sf0.1 numbers
    assert(Bench.bestPriorTimes(dir.toFile, names, "/data/sf0.01").isEmpty)
  }

  test("empty dir yields no baselines (detection disabled, not crashed)") {
    val dir = Files.createTempDirectory("graft-benchparse-empty")
    dir.toFile.deleteOnExit()
    assert(Bench.bestPriorTimes(dir.toFile, Seq("q_alpha"), "/data/sf0.1").isEmpty)
  }

  test("a malformed artifact is skipped; intact rounds still count") {
    val dir = Files.createTempDirectory("graft-benchparse-bad")
    dir.toFile.deleteOnExit()
    Files.writeString(dir.resolve("BENCH_r06.json"), artifact)
    Files.writeString(dir.resolve("BENCH_r05.json"),
      artifact.substring(0, artifact.length / 2)) // truncated mid-object
    Files.writeString(dir.resolve("BENCH_r04.json"), "not json at all")
    val best = Bench.bestPriorTimes(dir.toFile,
      Seq("q_alpha", "q_beta"), "/data/sf0.1")
    assert(best == Map("q_alpha" -> 1.25, "q_beta" -> 2.25))
  }

  test("BENCH_DETAIL_r*.json full-line artifacts count, top-level shape") {
    val dir = Files.createTempDirectory("graft-benchparse-detail")
    dir.toFile.deleteOnExit()
    // driver shape: partial (post-r10 compact summary keeps only slowest)
    Files.writeString(dir.resolve("BENCH_r10.json"), artifact)
    // builder-committed copy of bench_last.json: full map at the TOP level
    Files.writeString(dir.resolve("BENCH_DETAIL_r09.json"),
      """{"metric":"total","value":9.9,"queries":{"q_alpha":0.75,"q_gamma":3.0},"sf":"/data/sf0.1"}""")
    // a detail file at another sf must not contribute
    Files.writeString(dir.resolve("BENCH_DETAIL_r08.json"),
      """{"queries":{"q_alpha":0.01},"sf":"/data/sf0.01"}""")
    // bench_last.json itself is still ignored (it is THIS run's output)
    Files.writeString(dir.resolve("bench_last.json"),
      """{"queries":{"q_alpha":0.001},"sf":"/data/sf0.1"}""")
    val best = Bench.bestPriorTimes(dir.toFile,
      Seq("q_alpha", "q_beta", "q_gamma"), "/data/sf0.1")
    assert(best("q_alpha") == 0.75) // min across driver artifact and detail
    assert(best("q_beta") == 2.25)
    assert(best("q_gamma") == 3.0) // detail-only query still baselined
  }

  test("pretty-print changes do not break the parse (it is not a regex)") {
    val dir = Files.createTempDirectory("graft-benchparse-fmt")
    dir.toFile.deleteOnExit()
    // same document, hostile formatting: no space after colons, newlines
    // inside the queries object, reordered keys
    val reformatted =
      """{"parsed":{"sf":"/data/sf0.1","queries":{
        |"q_alpha":1.25,
        |  "q_beta"  :  2.25},"metric":"total"},
        |"tail": "{\"queries\":{\"q_alpha\":9.99}}"}""".stripMargin
    Files.writeString(dir.resolve("BENCH_r03.json"), reformatted)
    val best = Bench.bestPriorTimes(dir.toFile,
      Seq("q_alpha", "q_beta"), "/data/sf0.1")
    assert(best == Map("q_alpha" -> 1.25, "q_beta" -> 2.25))
  }
}
