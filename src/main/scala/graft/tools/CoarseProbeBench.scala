package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Flat vs two-level standing-probe cost at the soak geometry (nlist=64,
  * 20k corpus, 8k-query batches) — the measurement behind the coarse
  * auto-threshold: the tier exists to kill the nlist-linear centroid
  * ranking at production nlist (10⁵–10⁶), but at small nlist the
  * two-level choice must not tax the serving path it rides by default.
  * Usage: `runMain graft.tools.CoarseProbeBench [nlist] [queries]`. */
object CoarseProbeBench {
  def main(args: Array[String]): Unit = {
    val nlist = args.headOption.map(_.toInt).getOrElse(64)
    val nq = args.lift(1).map(_.toInt).getOrElse(8000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.range(20000L)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), j -> cast(pmod(id * 31 + j * 17, 997) / 997.0 as float))")
          .as("embedding"))
    val queries = spark.range(nq.toLong)
      .select((col("id") + 20000L).as("vec_id"),
        expr("transform(sequence(0, 63), j -> cast(pmod((id + 7) * 43 + j * 17, 997) / 997.0 as float))")
          .as("embedding"))
      .persist()
    val _ = queries.count()
    val index = graft.operators.Similarity.buildIvfIndex(corpus, nlist)
    val flat = java.nio.file.Files.createTempDirectory("cpb-flat").toString
    val coarse = java.nio.file.Files.createTempDirectory("cpb-coarse").toString
    graft.operators.Similarity.writeIvfIndex(index, flat, ncoarse = 0)
    graft.operators.Similarity.writeIvfIndex(index, coarse,
      graft.operators.Similarity.autoNcoarse(nlist))
    for ((label, path) <- Seq(("flat", flat), ("coarse", coarse))) {
      val standing = graft.operators.Similarity.prepareIvfIndex(spark, path)
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        val n = graft.operators.Similarity
          .queryStandingIvf(standing, queries).count()
        println(f"""{"variant":"$label","iter":$i,"ms":${(System.nanoTime() - t0) / 1e6}%.0f,"rows":$n,"coarse":${standing.coarse.nonEmpty}}""")
      }
    }
    spark.stop()
  }
}
