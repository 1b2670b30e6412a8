package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

/** Scratch microbench (test scope, not a recorded artifact): per-trigger
  * cost decomposition of the COMPOSED IVF×PQ serving probe — query
  * collect, driver probe-cell choice, distance tables, broadcast, the
  * pruned scan, and the cell-aware fold. */
object IvfPqProbeBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = spark.range(20000L)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), j -> cast(pmod(id * 31 + j * 17, 997) / 997.0 as float))")
          .as("embedding"))
    val path = java.nio.file.Files.createTempDirectory("ivfpqbench").toString
    val index = Similarity.buildIvfIndex(corpus, nlist = 64)
    Pq.writeIvfPqIndex(index.bucketed, Pq.train(corpus), index.centers, path)
    val queryFrame = spark.range(8000L)
      .select((col("id") + 20000L).as("vec_id"),
        expr("transform(sequence(0, 63), j -> cast(pmod((id + 7) * 43 + j * 17, 997) / 997.0 as float))")
          .as("embedding"))
      .persist()
    val _ = queryFrame.count()

    def time(label: String)(f: => Long): Unit = {
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$label iter$i: ${(System.nanoTime() - t0) / 1e6}%.0f ms ($n rows)")
      }
    }
    val standing = Pq.prepareIvfPqIndex(spark, path)
    time("full-probe") {
      Pq.queryStandingIvfPq(standing, queryFrame).count()
    }
    val q = queryFrame.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
    time("probe-cells-driver") {
      Similarity.probeCellsFor(standing.centers, q.toSeq, 4).length.toLong
    }
    time("dtabs-driver") {
      var i = 0
      while (i < q.length) {
        val _ = standing.model.distanceTable(q(i)._2); i += 1
      }
      q.length.toLong
    }
    val probes = Similarity.probeCellsFor(standing.centers, q.toSeq, 4)
    time("pruned-scan-decode") {
      standing.prunedCodes(probes.map(_._2))
        .select($"vec_id", $"codes", $"cell".cast("int"))
        .as[(Long, Seq[Int], Int)]
        .mapPartitions(it => Iterator.single(it.length.toLong)).collect().sum
    }
    val nparts = standing.prunedCodes(probes.map(_._2)).rdd.getNumPartitions
    println(s"pruned codes partitions: $nparts")
    spark.stop()
  }
}
