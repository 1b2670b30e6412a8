package graft.ml

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols.spread

/** The reference's ML stage (README.md:152-208), rebuilt on DataFrame-native
  * `spark.ml`: character-bigram hashing-TF featurization and seeded K-Means.
  *
  * Reference shape preserved exactly where it is a semantic choice:
  *  - `featurize(s) = tf.transform(s.sliding(2).toSeq)` (README.md:170-173)
  *    → bigram array UDF + `HashingTF(numFeatures = 1000)`;
  *  - `KMeans.train(vectors, k = 10, maxIterations = 20)` (README.md:179)
  *    → `ml.clustering.KMeans` with the same k/maxIter, but a FIXED seed —
  *    the reference used random init, which is untestable (SURVEY.md §5.5);
  *  - the driver-side predict loop over 50 collected tweets
  *    (README.md:187-194) → `model.transform(df)` adding a `prediction`
  *    column: distributed, no collect (SURVEY.md §2.7 U5);
  *  - `saveAsObjectFile(model.clusterCenters)` (README.md:198) →
  *    `KMeansModel.write` (S5), a portable Parquet-backed artifact.
  *
  * Scale notes: featurization is a narrow per-row map (no shuffle). Each
  * K-Means iteration broadcasts k×1000 sparse centers and tree-aggregates
  * partial sums — the same fixed per-iteration communication pattern at any
  * row count, which is what makes Lloyd's algorithm viable at 100 TB. The
  * UDF is the one non-codegen step; it is O(len) per row and feeds a
  * transformer that requires an array column, so a custom Expression would
  * buy nothing (SURVEY.md §7.3).
  */
object TextClustering {

  /** Character-bigram tokenizer (README.md:173: `s.sliding(2).toSeq`).
    * Null-safe; strings shorter than 2 chars yield themselves (the exact
    * `sliding` semantics the reference relied on).
    */
  private val bigrams = udf { s: String =>
    Option(s).map(_.sliding(2).toSeq).getOrElse(Seq.empty[String])
  }

  /** U2+U3 — bigram hashing-TF featurization of a text column. */
  def featurize(df: DataFrame, textCol: String = "text",
      numFeatures: Int = 1000): DataFrame =
    new HashingTF()
      .setInputCol("__bigrams")
      .setOutputCol("features")
      .setNumFeatures(numFeatures)
      .transform(df.withColumn("__bigrams", bigrams(col(textCol))))
      .drop("__bigrams")

  /** U4 — seeded K-Means over a `features` vector column. */
  def fitKMeans(features: DataFrame, k: Int = 10, maxIter: Int = 20,
      seed: Long = 42L): KMeansModel =
    new KMeans().setK(k).setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("prediction")
      .fit(features)

  /** The ONE fixture K-Means fit per (process, sf dir): the assignments
    * dump and the cluster-sizes rollup must see the SAME model, or two
    * independent fits could disagree on boundary docs and the dump-replay
    * oracle would mismatch for run-to-run reasons (the
    * [[graft.operators.Similarity.standingIndex]] pattern). */
  private val standingModels =
    scala.collection.concurrent.TrieMap.empty[String, KMeansModel]

  private def fixtureAssignments(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = featurize(
      spread(Tables.documents(spark, sfDir)).select(col("doc_id"), col("text")))
    val model = standingModels.getOrElseUpdate(sfDir, {
      val cached = feats.persist() // reference cached its vectors too (README.md:176)
      try fitKMeans(cached) finally cached.unpersist()
    })
    model.transform(feats).select(col("doc_id"), col("prediction"))
  }

  /** Registered dump (it IS the oracle input): per-document cluster
    * assignment from the standing seeded fit. K-Means itself is not
    * DuckDB-expressible, but with this dump the `kmeans_cluster_sizes`
    * rollup becomes a checked derivation — the model's output is captured
    * here and the aggregation arithmetic is what the oracle verifies (the
    * `ivf_assignments` pattern). */
  def assignmentsEntry(spark: SparkSession, sfDir: String): DataFrame =
    fixtureAssignments(spark, sfDir)

  /** End-to-end: documents.text → features → seeded K-Means → per-cluster
    * sizes. Deterministic under a fixed seed; oracle = DuckDB re-counting
    * the dumped assignments.
    */
  def clusterSizes(spark: SparkSession, sfDir: String): DataFrame =
    fixtureAssignments(spark, sfDir)
      .groupBy(col("prediction"))
      .agg(count(lit(1)).as("n_docs"))

  /** Embedding-space clustering over the `embeddings` fixture: the
    * `Array[Float]` column becomes an ml Vector (no UDF — built-in
    * `array_to_vector`), then seeded K-Means. Used by the cohesion spec
    * against the `label` ground truth.
    */
  def clusterEmbeddings(spark: SparkSession, sfDir: String, k: Int,
      seed: Long = 42L): DataFrame = {
    val feats = spread(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("label"),
        array_to_vector(col("embedding")).as("features"))
      .persist()
    try {
      val model = fitKMeans(feats, k = k, maxIter = 20, seed = seed)
      model.transform(feats).select(col("vec_id"), col("label"), col("prediction"))
    } finally feats.unpersist()
  }
}
