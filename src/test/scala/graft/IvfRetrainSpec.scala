package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The IVF retrain-on-drift lifecycle: planted drift must visibly injure
  * the health signal, the refit must cure it, and the staged swap must
  * leave a fully consistent index that batch and serving probes agree on. */
class IvfRetrainSpec extends SparkTestBase {
  import spark.implicits._

  test("retrain strictly improves corpus-weighted health on planted drift") {
    val health = Similarity.ivfRetrainHealth(spark, sf)
      .groupBy($"phase")
      .agg(sum($"sum_cos_micros").as("s"), sum($"n_vecs").as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (preS, preN) = health("pre")
    val (postS, postN) = health("post")
    // conservation: the swap loses and duplicates nothing
    assert(preN == postN, s"vector count changed across swap: $preN -> $postN")
    val preMean = preS.toDouble / preN
    val postMean = postS.toDouble / postN
    assert(postMean > preMean,
      s"retrain did not improve weighted mean cos: pre=$preMean post=$postMean")
  }

  test("post-swap index is self-consistent: every assignment is the nearest NEW centroid") {
    val path = Similarity.retrainFixturePath(spark, sf)
    val idx = Similarity.loadIvfIndex(spark, path)
    val mismatched = idx.bucketed
      .withColumn("expected", graft.functions.VectorExpressions
        .nearestCenter($"embedding", idx.centers))
      .filter($"cell".cast("int") =!= $"expected")
      .count()
    assert(mismatched == 0,
      s"$mismatched vectors assigned to a non-nearest centroid after the swap")
  }

  test("batch probe and re-prepared serving probe agree on the swapped index") {
    val path = Similarity.retrainFixturePath(spark, sf)
    val idx = Similarity.loadIvfIndex(spark, path)
    val queries = idx.bucketed.select($"vec_id", $"embedding")
      .filter($"vec_id" < 5)
      .as[(Long, Seq[Float])].collect().toSeq
    val batch = Similarity.queryIvfIndex(idx, queries)
      .as[(Long, Long, Double, Long)].collect().toSet
    val standing = Similarity.prepareIvfIndex(spark, path)
    val qf = queries.toDF("vec_id", "embedding")
    val serving = Similarity.queryStandingIvf(standing, qf)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(batch == serving)
    assert(batch.nonEmpty)
  }
}
