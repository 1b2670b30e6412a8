package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scratch microbench (test scope, not a recorded artifact): per-batch cost
  * of the serving probe — old shape (re-read corpus per batch) vs the
  * prepared StandingIvf handle — outside the streaming harness. */
object AnnProbeBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
        // the serving top-k aggregate groups by query_id: thousands of
        // groups per task is the NORMAL shape, not a fallback case
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.range(20000L)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), j -> cast(pmod(id * 31 + j * 17, 997) / 997.0 as float))")
          .as("embedding"))
    val path = java.nio.file.Files.createTempDirectory("annbench").toString
    Similarity.writeIvfIndex(Similarity.buildIvfIndex(corpus, nlist = 64), path)
    val queryFrame = spark.range(8000L)
      .select((col("id") + 20000L).as("vec_id"),
        expr("transform(sequence(0, 63), j -> cast(pmod((id + 7) * 43 + j * 17, 997) / 997.0 as float))")
          .as("embedding"))
      .persist()
    val queries = queryFrame
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq

    def time(label: String)(f: => Long): Unit = {
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$label iter$i: ${(System.nanoTime() - t0) / 1e6}%.0f ms ($n rows)")
      }
    }
    val standing = Similarity.prepareIvfIndex(spark, path)
    time("old-reload") {
      Similarity.queryIvfIndex(Similarity.loadIvfIndex(spark, path), queries).count()
    }
    time("standing") {
      Similarity.queryStandingIvf(standing, queryFrame).count()
    }
    // — the r13 sink-retry fix decomposition (VERDICT r13 "what's wrong"
    // #2): the serving loop eagerly materializes each trigger's result
    // BEFORE the sink so a retry can't double sink side effects. Three
    // candidate materializations of the same queries×k-bounded result:
    time("standing+localCheckpoint") {
      Similarity.queryStandingIvf(standing, queryFrame)
        .localCheckpoint(true).count()
    }
    time("standing+collect-recreate") {
      val out = Similarity.queryStandingIvf(standing, queryFrame)
      val rows = out.collect()
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), out.schema).count()
    }
    time("standing+cache-count") {
      val out = Similarity.queryStandingIvf(standing, queryFrame).cache()
      try out.count() finally { val _ = out.unpersist(false) }
    }
    // decompose: driver-side probe choice + createDataFrame alone
    time("driver-side-only") {
      val byId = queries.toMap
      val probes = Similarity.probeCellsFor(standing.centers, queries, 4)
        .map { case (q, c) => (q, c, byId(q)) }
      spark.createDataFrame(probes).toDF("query_id", "cell", "q_emb").count()
    }
    // decompose: join + cosine WITHOUT the two-window ranking
    time("score-only") {
      val byId = queries.toMap
      val probes = Similarity.probeCellsFor(standing.centers, queries, 4)
        .map { case (q, c) => (q, c, byId(q)) }
      val queryCells = spark.createDataFrame(probes)
        .toDF("query_id", "cell", "q_emb")
      val pruned = standing.prunedCorpus(probes.map(_._2).distinct)
      pruned.join(broadcast(queryCells),
          pruned("cell") === queryCells("cell") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          round(Similarity.cosine(col("embedding"), col("q_emb")), 6).as("cosine"))
        .filter(col("cosine") > lit(2.0)).count() // force full scoring, ~0 rows out
    }
    spark.stop()
  }
}
