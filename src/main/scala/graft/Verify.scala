package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure policy: a query that throws is recorded in `$outDir/_errors.json`
  * (always written, `{}` when clean) — NOT merely printed to stderr. Round 8
  * demonstrated why: 13 broken queries produced a correctness artifact with
  * zero err rows because the catch block swallowed them silently, and the
  * regression was invisible until the judge diffed query counts. A harness
  * whose failure mode is silence will eventually hide a real correctness
  * bug, not just an environment flip. VerifyHarnessSpec pins this.
  */
object Verify {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Dump every query's result to `$outDir/<name>` parquet; collect
    * per-query failures and write them as `$outDir/_errors.json`. Returns
    * the error map (empty when all queries dumped cleanly). Factored out of
    * main so the harness itself is spec-testable with a deliberately-broken
    * query (VerifyHarnessSpec).
    */
  def dumpAll(spark: SparkSession, sfDir: String, outDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame],
      preErrors: Seq[(String, String)] = Nil): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    // No coalesce(1): it would pull each query's final stage (including any
    // TakeOrdered) onto one task. The oracle reads a parquet glob, so
    // multi-file output is fine.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    errors ++= preErrors
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    val errJson = errors
      .map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} of ${queries.size} queries FAILED — see $outDir/_errors.json")
    errors.toMap
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions) // SQL surface incl. graft_* TVFs
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts (see Tables.events)
      .config("spark.ui.enabled", "false")
      // 100-entry default thrashes across 50 queries → per-query Janino
      // recompilation (see Bench.scala / BENCH_NOTES.md round-7 postmortem)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Fixture-contract gate: a driver-side regeneration that changes an
    // encoding shows up here as one named diagnostic per violation (carried
    // into _errors.json under _fixture_contract), not as N scattered
    // downstream type errors.
    val contract = graft.sources.FixtureContract.check(spark, sfDir)
    contract.foreach(d => System.err.println(s"[verify] $d"))
    val pre =
      if (contract.isEmpty) Nil
      else Seq("_fixture_contract" -> contract.mkString(" | "))
    // optional comma-separated filter (same contract as Bench): dev-loop
    // tool for iterating on a few queries against a FRESH out dir. The
    // driver never sets it, so the gate always dumps the full surface.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val queries = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n)) }
    dumpAll(spark, sfDir, outDir, queries, pre)
    // {OUT} placeholder → this run's absolute output dir: lets an oracle
    // read SPARK-COMPUTED artifacts (e.g. simhash signatures) and verify a
    // derivation DuckDB can express over a hash it cannot (xxhash64).
    val outAbs = Paths.get(outDir).toAbsolutePath.toString
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v.replace("{OUT}", outAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
