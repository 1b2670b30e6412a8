package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query at the given scale factor and
  * emits one JSON line with per-query wall times.
  *
  * Measurement notes:
  *  - The action is a `noop`-format write: every column of every row is fully
  *    computed and serialized, but nothing hits disk. A bare `.count()` would
  *    let Catalyst prune projections/sorts and time an empty scan instead.
  *  - One untimed warmup pass per query first (JIT + page cache + codegen
  *    compilation), then TWO timed passes keeping the per-query MIN.
  *    Cold-start noise made rounds 1-2 incomparable (61.9 s vs 15.3 s on
  *    identical code), and round 3 showed one-off ~40 s environmental stalls
  *    (OS memory management under a ~90 GB heap; GC logs clean, stall moves
  *    to a random query per run) — min-of-2 reports the plan's cost, not
  *    the environment's worst hiccup.
  *  - Failures are recorded per query in `errors` (time -1), never swallowed.
  *  - The JSON line goes to stdout AND to bench_last.json in the working
  *    directory (sbt's forked-run log prefixes made rounds 1-2 unparseable;
  *    build.sbt now also sets StdoutOutput so the stdout line is raw).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts (see Tables.events)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // optional comma-separated query filter, for isolating one query's time
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // warmup: full untimed pass (also fails fast on broken queries)
    names.foreach { name =>
      try runOnce(SparkEntry.queries(name))
      catch { case e: Throwable => errors(name) = e.toString.take(200) }
    }
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      try { runOnce(SparkEntry.queries(name)); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable => errors(name) = e.toString.take(200); -1.0 }
    }
    val times = names.map { name =>
      if (errors.contains(name)) name -> -1.0
      else {
        val a = timed(name)
        if (errors.contains(name)) name -> -1.0
        else { val b = timed(name); name -> (if (b >= 0) math.min(a, b) else -1.0) }
      }
    }

    def jq(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = times.map { case (k, v) => s"${jq(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jq(k)}:${jq(v)}" }.mkString("{", ",", "}")
    val total = times.collect { case (_, v) if v >= 0 => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":${jq(sfDir)}}"""
    Files.writeString(Paths.get("bench_last.json"), line + "\n")
    spark.stop()
    // print last, after Spark's shutdown logging, so the line tails cleanly
    println(line)
  }
}
