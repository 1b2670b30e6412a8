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
  *  - documents: shard 0 is the fixture verbatim; shard r > 0 applies a
  *    per-shard LETTER SUBSTITUTION (Caesar rotation of a–z by r — a
  *    character bijection, so shingle-set sizes, token counts, text
  *    lengths, and every within-shard Jaccard relation are exactly the
  *    fixture's, while cross-shard CHARACTER-shingle overlap drops to
  *    ~zero); doc_id' = doc_id + r·N. A token-suffix variant ("t_r") was
  *    measured first and REJECTED: suffixed tokens still share most of
  *    their 5-char shingles across shards (only the digit windows
  *    differ), which put cross-shard twin pairs in the minhash
  *    band-collision sweet spot — 48.6M candidate pairs at 10× (vs the
  *    linear ~50k) that exact-verify then rejected, a pathological
  *    near-miss workload, not a bigger fixture.
  *  - embeddings: shard r circularly shifts the float vector by r
  *    positions and then flips coordinate signs by a per-(shard,
  *    coordinate) deterministic ±1 mask (a signed permutation — an
  *    orthogonal map, so norms and all within-shard inner products are
  *    exactly preserved, while cross-shard cosines decorrelate even for
  *    quasi-periodic fixture vectors a bare rotation would leave
  *    aligned); vec_id' = vec_id + r·N, label carried.
  *
  * Deterministic end to end (no RNG), so repeated runs produce
  * byte-identical inputs and timings are comparable across rounds.
  *
  * Usage: `runMain graft.tools.ScaleGen [srcSfDir] [outDir] [replicas]`
  * (defaults: /root/testdata/sf0.1 → /tmp/graft_sf1 × 10).
  */
object ScaleGen {

  private val Alphabet = "abcdefghijklmnopqrstuvwxyz"

  def scaleDocuments(docs: DataFrame, replicas: Int): DataFrame = {
    val n = lit(docs.count())
    // one translate() branch per shard (replicas is small): Caesar-rotated
    // lower-case alphabet, shard 0 verbatim
    def shardText(r: Int) =
      if (r == 0) col("text")
      else translate(col("text"), Alphabet,
        Alphabet.drop(r % 26) + Alphabet.take(r % 26))
    val textCol = (1 until replicas).foldLeft(
      when(col("r") === 0, shardText(0))) { (acc, r) =>
        acc.when(col("r") === r, shardText(r))
      }
    docs
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        explode(sequence(lit(0), lit(replicas - 1))).as("r"))
      .select(
        (col("doc_id") + col("r") * n).as("doc_id"),
        textCol.as("text"),
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
        // signed coordinate permutation: circular shift by r, then a
        // per-(shard, coordinate) ±1 mask (xxhash parity — deterministic);
        // shard 0 verbatim
        expr("CASE WHEN r = 0 THEN embedding ELSE " +
          "transform(sequence(0, size(embedding) - 1), " +
          "j -> element_at(embedding, " +
          "cast(pmod(j + r, size(embedding)) as int) + 1) * " +
          "cast(CASE WHEN pmod(xxhash64(r, j), 2) = 0 THEN 1.0 ELSE -1.0 " +
          "END as float)) END").as("embedding"),
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
