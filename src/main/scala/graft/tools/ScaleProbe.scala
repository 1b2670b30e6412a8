package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level decomposition of the text-dedup pipeline at a given data
  * dir — the diagnostic behind [[ScaleBench]]'s scaling table: when a
  * composed entry's wall ratio exceeds the data ratio, this points at the
  * stage. Prints one JSON line per stage. Usage:
  * `runMain graft.tools.ScaleProbe [dir]`. */
object ScaleProbe {
  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text")
    val (nd, tDocs) = timed(docs.count())
    println(s"""{"stage":"docs","rows":$nd,"sec":${f"$tDocs%.2f"}}""")

    // shingling alone
    val base = graft.util.Cols.spread(docs)
      .select($"doc_id", coalesce($"text", lit("")).as("t"))
      .filter(length($"t") >= 5)
    val (nsh, tSh) = timed(base.select(
        graft.functions.TextExpressions.charShingles($"t", 5).as("s"))
      .agg(sum(size($"s"))).head().getLong(0))
    println(s"""{"stage":"shingles","total":$nsh,"sec":${f"$tSh%.2f"}}""")

    // minhash banding alone
    val bandedAll = base.select($"doc_id",
      posexplode(graft.operators.Dedup.bandKeys($"t", 5, 128, 8))
        .as(Seq("band", "bsig")))
    val (nb, tBand) = timed(bandedAll.count())
    println(s"""{"stage":"banded_rows","rows":$nb,"sec":${f"$tBand%.2f"}}""")

    // bucket-size histogram: the quantity the self-join cost is quadratic in
    val hist = bandedAll.groupBy($"band", $"bsig")
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("buckets"), max($"n").as("max_n"),
        sum(($"n" * ($"n" - 1)).cast("long") / lit(2L))
          .cast("long").as("pair_work")).head()
    println(s"""{"stage":"buckets","buckets":${hist.getLong(0)},"max":${hist.getLong(1)},"pair_work":${hist.getLong(2)}}""")

    // candidates (banded self-join, capped) — inline twin of the private
    // bandedCandidates, same shape
    val banded = bandedAll // cap not applied here; pair_work above shows need
    val (ncand, tCand) = timed(banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bsig") === col("r.bsig") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id"), col("r.doc_id")).distinct().count())
    println(s"""{"stage":"candidates","pairs":$ncand,"sec":${f"$tCand%.2f"}}""")

    // full pair pipeline (candidates + exact verify)
    val (npairs, tPairs) = timed(
      graft.operators.Dedup.nearDupPairsOf(docs).count())
    println(s"""{"stage":"verified_pairs","pairs":$npairs,"sec":${f"$tPairs%.2f"}}""")

    // text stats (the quality_score side of quality_keep_dedup)
    val (nq, tQ) = timed(graft.operators.TextAnalysis
      .textStatsOf(spark.read.parquet(s"$dir/documents.parquet")).count())
    println(s"""{"stage":"text_stats","rows":$nq,"sec":${f"$tQ%.2f"}}""")

    spark.stop()
  }
}
