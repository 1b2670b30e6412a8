package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Pq

/** Scratch microbench (test scope, not a recorded artifact): per-batch cost
  * decomposition of the PQ ADC serving probe — where does a trigger's time
  * go between query collect, distance-table build, broadcast, the
  * partition-local fold, and the final bounded-top-k merge. */
object PqProbeBench {
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
    val path = java.nio.file.Files.createTempDirectory("pqbench").toString
    Pq.writePqIndex(corpus, Pq.train(corpus), path)
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
    val standing = Pq.preparePqIndex(spark, path)
    time("full-probe") {
      Pq.queryStandingPq(standing, queryFrame).count()
    }
    time("collect-queries") {
      queryFrame.select($"vec_id", $"embedding")
        .as[(Long, Seq[Float])].collect().length.toLong
    }
    val q = queryFrame.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
    val model = standing.model
    time("dtabs-driver") {
      var i = 0
      while (i < q.length) { val _ = model.distanceTable(q(i)._2); i += 1 }
      q.length.toLong
    }
    time("codes-read-decode") {
      spark.read.schema(standing.schema).parquet(standing.codesPath)
        .select($"vec_id", $"codes").as[(Long, Seq[Int])]
        .mapPartitions(it => Iterator.single(it.length.toLong)).collect().sum
    }
    val nparts = spark.read.schema(standing.schema)
      .parquet(standing.codesPath).rdd.getNumPartitions
    println(s"codes partitions: $nparts")
    spark.stop()
  }
}
