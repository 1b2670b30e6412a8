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
  *  - STALL DETECTION (round 6 postmortem): the host occasionally stalls the
  *    whole JVM for seconds at a time (OS memory management under a ~90 GB
  *    heap; GC logs clean), inflating a random subset of queries even under
  *    min-of-2 — round 6 shipped a 1.9× contaminated artifact on mostly
  *    byte-identical plans. Any query slower than 2× its best time across
  *    ALL prior-round `BENCH_r*.json` artifacts is re-measured twice more at
  *    the end of the run (sequentially — nothing else competes), the best
  *    time wins, and the query is listed in `stall_suspected` with its
  *    contaminated in-run time in `in_run_times` so regressions stay
  *    auditable instead of silently averaged away.
  *  - The JSON line goes to stdout AND to bench_last.json in the working
  *    directory (sbt's forked-run log prefixes made rounds 1-2 unparseable;
  *    build.sbt now also sets StdoutOutput so the stdout line is raw).
  */
object Bench {

  /** Best-known time per query across every committed bench artifact in
    * `dir`, read as actual JSON ([[graft.util.MiniJson]]). Two shapes are
    * consulted:
    *  - `BENCH_r*.json` (driver-written): queries live under
    *    `parsed.queries` with `parsed.sf` — the raw escaped `tail` copy of
    *    the same map is never consulted (its times may be a different
    *    run's). Since round 10 the driver's record is a compact summary
    *    (top-slowest queries only), so this source is partial going forward.
    *  - `BENCH_DETAIL_r*.json` (builder-committed copies of
    *    `bench_last.json`): full per-query map at the TOP level with a
    *    top-level `sf` — the complete baseline source from round 10 on.
    * A regex parse here silently broke once already on the writer's
    * pretty-printing; real parsing makes the extraction shape-stable, and a
    * malformed artifact skips THAT FILE only (Try per file) instead of
    * disabling detection wholesale. Taking the MIN across rounds means one
    * contaminated prior round can't mask a stall in this one. Only
    * artifacts recorded at the SAME sf dir count — a dev run at a smaller
    * scale factor must not be judged against sf0.1 baselines.
    */
  def bestPriorTimes(dir: java.io.File, names: Seq[String],
      sfDir: String): Map[String, Double] = {
    val nameSet = names.toSet
    def queryTimes(root: Any, path: String*): Seq[(String, Double)] = for {
      _ <- graft.util.MiniJson.at(root, path :+ "sf": _*).toSeq
        .filter(_ == sfDir)
      qs <- graft.util.MiniJson.at(root, path :+ "queries": _*).toSeq
        .collect { case m: Map[String @unchecked, Any @unchecked] => m }
      (n, v) <- qs.toSeq
      if nameSet(n)
      t <- Some(v).collect { case d: Double => d }
      if t > 0
    } yield n -> t
    val perFile = for {
      f <- Option(dir.listFiles()).getOrElse(Array[java.io.File]()).toSeq
      shape <- f.getName match {
        case n if n.matches("BENCH_r\\d+\\.json") => Seq("driver")
        case n if n.matches("BENCH_DETAIL_r\\d+\\.json") => Seq("full")
        case _ => Nil
      }
      root <- scala.util.Try(
        graft.util.MiniJson.parse(Files.readString(f.toPath))).toOption.toSeq
      nt <- if (shape == "driver") queryTimes(root, "parsed")
            else queryTimes(root)
    } yield nt
    perFile.groupMapReduce(_._1)(_._2)(math.min)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions) // SQL surface incl. graft_* TVFs
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts (see Tables.events)
      .config("spark.ui.enabled", "false")
      // The generated-class cache holds only 100 entries by default; 50
      // queries × several WholeStageCodegen units each far exceed it, so
      // every re-execution Janino-recompiled its stages from scratch —
      // the real cause of the 2-10× per-query inflation rounds 3-6
      // misdiagnosed as host stalls (BENCH_NOTES.md round-7 postmortem).
      // Static conf: must be set before the first session is created.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
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
    val inRunTimes = names.map { name =>
      if (errors.contains(name)) name -> -1.0
      else {
        val a = timed(name)
        if (errors.contains(name)) name -> -1.0
        else { val b = timed(name); name -> (if (b >= 0) math.min(a, b) else -1.0) }
      }
    }

    val prevBest = bestPriorTimes(new java.io.File("."), names, sfDir)
    val suspects = inRunTimes.collect {
      case (n, t) if t > 0 && prevBest.get(n).exists(p => t > 2 * p) => n
    }
    val times = inRunTimes.map { case (n, t) =>
      if (!suspects.contains(n)) n -> t
      else {
        val redo = Seq(timed(n), timed(n)).filter(_ >= 0)
        n -> (if (redo.isEmpty) t else math.min(t, redo.min))
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
    val stallJson = suspects.map(jq).mkString("[", ",", "]")
    val inRunJson = suspects
      .map(n => s"${jq(n)}:${inRunTimes.toMap.apply(n)}").mkString("{", ",", "}")
    val total = times.collect { case (_, v) if v >= 0 => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"stall_suspected":$stallJson,"in_run_times":$inRunJson,"sf":${jq(sfDir)}}"""
    Files.writeString(Paths.get("bench_last.json"), line + "\n")
    // Compact summary, printed LAST: the driver records only a ~2000-char
    // stdout tail, and the full 160-entry line above (~5 KB) truncated
    // mid-dict two rounds running (BENCH_r08/r09 `parsed: null`). The tail
    // must therefore end with one self-contained parseable record. It keeps
    // the driver's expected shape (metric/value/unit/queries/sf) but caps
    // `queries` at the slowest entries that fit a fixed budget; the full
    // map lives in bench_last.json (committed per round as
    // BENCH_DETAIL_r*.json, which bestPriorTimes reads for stall baselines).
    // strict slowest-PREFIX: stop at the first entry that overflows the
    // budget (a fold that kept trying later, shorter-named entries would
    // make "queries_truncated_to_slowest" a lie)
    val slowest = times.filter(_._2 >= 0).sortBy(-_._2)
      .map { case (k, v) =>
        (k, v, jq(k).length + f"$v%.3f".length + 2) }
      .scanLeft(("", 0.0, 0)) { case ((_, _, acc), (k, v, len)) =>
        (k, v, acc + len) }
      .drop(1).takeWhile(_._3 <= 600)
      .map { case (k, v, _) => (k, v) }
    val topQs = slowest.map { case (k, v) => s"${jq(k)}:${f"$v%.3f"}" }
      .mkString("{", ",", "}")
    def summaryLine(q: String, nq: Int): String =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${times.size},"n_errors":${errors.size},"queries":$q,"queries_truncated_to_slowest":$nq,"detail":"bench_last.json","sf":${jq(sfDir)}}"""
    // never throw here — a lost artifact is worse than a short one
    val full = summaryLine(topQs, slowest.size)
    val summary = if (full.length < 1000) full else summaryLine("{}", 0)
    spark.stop()
    // print last, after Spark's shutdown logging, so the line tails cleanly
    println(line)
    println(summary)
  }
}
