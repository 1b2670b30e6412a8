package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic SCALE-UP generator: replicate the driver-generated fixture
  * tables (documents, embeddings) R× while PRESERVING their per-shard
  * distributions — the out-of-fixture data the sf1-equivalent scaling run
  * ([[ScaleBench]]) measures against. Replica shard r is the fixture with
  * a shard-local transform that keeps every within-shard statistic the
  * heavy entries exercise (shingle/minhash structure, token frequencies,
  * text lengths, embedding norms and intra-shard cosine geometry) while
  * DECORRELATING shards from each other — so near-dup pair density,
  * cluster structure, and index fan-out scale LINEARLY with volume
  * instead of exploding quadratically the way naive row duplication
  * would (10 exact copies of every doc = every cluster 10× wider = pair
  * work 100×, a different workload, not a bigger one):
  *
  *  - documents: shard 0 is the fixture verbatim; shard r > 0 rewrites
  *    each whitespace token t → "t_r" (a per-shard vocabulary renaming —
  *    a bijection, so shingle-set sizes, token counts, and within-shard
  *    Jaccard relations are exactly the fixture's, and cross-shard
  *    token/shingle overlap is zero); doc_id' = doc_id + r·N.
  *  - embeddings: shard r circularly shifts the float vector by r
  *    positions (a coordinate permutation — norms and all within-shard
  *    inner products exactly preserved, cross-shard cosines decorrelated);
  *    vec_id' = vec_id + r·N, label carried.
  *
  * Deterministic end to end (no RNG), so repeated runs produce
  * byte-identical inputs and timings are comparable across rounds.
  *
  * Usage: `runMain graft.tools.ScaleGen [srcSfDir] [outDir] [replicas]`
  * (defaults: /root/testdata/sf0.1 → /tmp/graft_sf1 × 10).
  */
object ScaleGen {

  def scaleDocuments(docs: DataFrame, replicas: Int): DataFrame = {
    val n = lit(docs.count())
    docs
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        explode(sequence(lit(0), lit(replicas - 1))).as("r"))
      .select(
        (col("doc_id") + col("r") * n).as("doc_id"),
        when(col("r") === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit("_"), col("r"))), " ")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def scaleEmbeddings(emb: DataFrame, replicas: Int): DataFrame = {
    val n = lit(emb.count())
    emb
      .select(col("vec_id"), col("embedding"), col("label"),
        explode(sequence(lit(0), lit(replicas - 1))).as("r"))
      .select(
        (col("vec_id") + col("r") * n).as("vec_id"),
        expr("transform(sequence(0, size(embedding) - 1), " +
          "j -> element_at(embedding, " +
          "cast(pmod(j + r, size(embedding)) as int) + 1))").as("embedding"),
        col("label"))
  }

  def generate(spark: SparkSession, srcDir: String, outDir: String,
      replicas: Int): Unit = {
    scaleDocuments(spark.read.parquet(s"$srcDir/documents.parquet"),
        replicas)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    scaleEmbeddings(spark.read.parquet(s"$srcDir/embeddings.parquet"),
        replicas)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, replicas)
    val docs = spark.read.parquet(s"$out/documents.parquet").count()
    val vecs = spark.read.parquet(s"$out/embeddings.parquet").count()
    println(s"""{"out":"$out","replicas":$replicas,"documents":$docs,"embeddings":$vecs}""")
    spark.stop()
  }
}
