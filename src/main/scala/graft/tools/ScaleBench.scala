package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DIRECT SCALE EVIDENCE for the heavy path — the out-of-fixture data
  * point the design audits extrapolate from: run the five heaviest
  * registered entries, the iterative-clustering round count, and one
  * standing-index build→append→probe cycle at BOTH sf0.1 (the fixture)
  * and the [[ScaleGen]] sf1-equivalent (≥10× the rows, same per-shard
  * distributions), in ONE JVM so the wall ratios are apples-to-apples
  * (shared session, same codegen cache; each entry runs twice per scale
  * and reports the second pass, the bench harness's warm-measured
  * discipline). Prints one JSON line per measurement plus a summary —
  * recorded into BENCH_NOTES.md's scaling table; a ratio far above the
  * data ratio on a linear-by-design entry is a scale bug, on an
  * all-pairs-by-spec entry it is the quadratic oracle shape whose scale
  * path is the banded/indexed variant (flagged per entry in the notes).
  *
  * Usage: `runMain graft.tools.ScaleBench [sfDir] [scaledDir]`
  * (defaults: /root/testdata/sf0.1 and /tmp/graft_sf1 — generate the
  * latter with ScaleGen first). NOT part of the per-round driver bench;
  * run manually, never concurrently with another sbt JVM.
  */
object ScaleBench {

  private val HeavyEntries = Seq(
    "embedding_dup_clusters", "token_jaccard_pairs",
    "tiered_incremental_dedup", "trimmed_release_corpus",
    "quality_keep_dedup")

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scaledDir = args.lift(1).getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def record(name: String, sec: Double, extra: String = ""): Unit = {
      results(name) = sec
      println(f"""{"entry":"$name","sec":$sec%.2f$extra}""")
    }

    for (dir <- Seq(sfDir, scaledDir); entry <- HeavyEntries) {
      val tag = if (dir == sfDir) "sf0.1" else "sf1"
      val q = graft.SparkEntry.queries(entry)
      val (_, warm) = timed(q(spark, dir).count()) // warmup: codegen + fs cache
      val (n, sec) = timed(q(spark, dir).count())
      record(s"$entry@$tag", sec, s""","rows":$n,"warm_sec":${f"$warm%.2f"}""")
    }

    // production-geometry embedding near-dup (threshold 0.95, b=32, r=8
    // — the 100 TB geometry the embedding tier's scale argument is
    // about): the REGISTERED embedding entries deliberately run the
    // near-exhaustive oracle geometry (threshold 0.4, r=2 → 4 keys per
    // band), whose hot-bucket cap correctly drops every bucket once the
    // corpus is 10× the key space — a capped no-op, not a measurement.
    // This is the embedding tier's actual scale path.
    for ((dir, tag) <- Seq((sfDir, "sf0.1"), (scaledDir, "sf1"))) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val (_, w) = timed(graft.operators.Dedup.embeddingNearDupOf(e,
        threshold = 0.95, numBands = 32, rowsPerBand = 8).count())
      val (np, sec) = timed(graft.operators.Dedup.embeddingNearDupOf(e,
        threshold = 0.95, numBands = 32, rowsPerBand = 8).count())
      record(s"embedding_near_dup_prod@$tag", sec,
        s""","pairs":$np,"warm_sec":${f"$w%.2f"}""")
    }

    // iterative-clustering ROUND COUNT at the larger graph diameter — the
    // first out-of-fixture data point for the O(log diameter) claim
    for ((dir, tag) <- Seq((sfDir, "sf0.1"), (scaledDir, "sf1"))) {
      val pairs = graft.operators.Dedup.nearDupPairsOf(
        spark.read.parquet(s"$dir/documents.parquet")
          .select($"doc_id", $"text"))
      val ((clusters, rounds), sec) = timed {
        val (c, r) = graft.operators.Dedup.dupClustersWithRounds(pairs)
        (c.count(), r)
      }
      record(s"dup_cluster_rounds@$tag", sec,
        s""","rounds":$rounds,"clustered_nodes":$clusters""")
    }

    // standing-index lifecycle at scale: build (auto coarse tier at
    // nlist=64) → append 10% more → probe a 2k-query batch
    val emb = graft.util.Cols.spread(
        spark.read.parquet(s"$scaledDir/embeddings.parquet"))
      .select($"vec_id", $"embedding")
    val total = emb.count()
    val idx = java.nio.file.Files
      .createTempDirectory("graft-scalebench-ivf").toString
    val (_, buildSec) = timed {
      graft.operators.Similarity.writeIvfIndex(
        graft.operators.Similarity.buildIvfIndex(
          emb.filter($"vec_id" % 11 =!= 0), nlist = 64), idx)
    }
    record("ivf_build@sf1", buildSec, s""","vecs":${total * 10 / 11}""")
    val (_, appendSec) = timed {
      graft.operators.Similarity.appendToIvfIndex(
        emb.filter($"vec_id" % 11 === 0), idx)
    }
    record("ivf_append@sf1", appendSec)
    val standing = graft.operators.Similarity.prepareIvfIndex(spark, idx)
    val queries = emb.filter($"vec_id" < 2000)
    val (_, warmProbe) = timed(
      graft.operators.Similarity.queryStandingIvf(standing, queries).count())
    val (probed, probeSec) = timed(
      graft.operators.Similarity.queryStandingIvf(standing, queries).count())
    record("ivf_probe_2k@sf1", probeSec,
      s""","rows":$probed,"warm_sec":${f"$warmProbe%.2f"},""" +
        s""""coarse":${standing.coarse.nonEmpty}""")

    println("{\"scalebench\":{" + results.map { case (k, v) =>
      s""""$k":${f"$v%.2f"}""" }.mkString(",") + "}}")
    spark.stop()
  }
}
