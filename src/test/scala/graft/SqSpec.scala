package graft

import org.apache.spark.sql.functions._

import graft.operators.Sq

/** SQ8 scalar quantization: grid arithmetic on crafted vectors, exact
  * integer-domain ranking against a driver recompute, and the two-stage
  * rerank's recall against the exact-L2 baseline.
  */
class SqSpec extends SparkTestBase {
  import spark.implicits._

  test("fit/encode: per-dim grid, clamping, constant-dim safety") {
    val emb = Seq(
      (0L, Seq(0.0f, 10.0f, 5.0f)),
      (1L, Seq(1.0f, 20.0f, 5.0f)),
      (2L, Seq(0.5f, 15.0f, 5.0f))).toDF("vec_id", "embedding")
    val m = Sq.fit(emb)
    assert(m.mins.toSeq == Seq(0.0, 10.0, 5.0))
    assert(m.scales(0) == 255.0 && m.scales(1) == 25.5)
    assert(m.scales(2) == 0.0) // constant dim
    val codes = Sq.encode(emb, m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(0L) == Seq(0, 0, 0))
    assert(codes(1L) == Seq(255, 255, 0))
    assert(codes(2L) == Seq(math.round(0.5 * 255).toInt, math.round(5 * 25.5).toInt, 0))
  }

  test("compressed-domain top-k equals the integer brute force") {
    val (emb, model) = {
      val e = graft.sources.Tables.embeddings(spark, sf)
        .select($"vec_id", $"embedding").filter($"embedding".isNotNull)
      (e, Sq.fit(e))
    }
    val byId = Sq.encode(emb, model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val queries = byId.keys.filter(_ < 5)
    val expected = queries.flatMap { q =>
      byId.toSeq.filter(_._1 != q)
        .map { case (v, c) =>
          val d = c.zip(byId(q)).map { case (a, b) =>
            (a - b).toLong * (a - b) }.sum
          (q, v, d)
        }
        .sortBy { case (_, v, d) => (d, v) }
        .take(10).zipWithIndex
        .map { case ((qq, v, d), i) => (qq, v, d, (i + 1).toLong) }
    }.toSet
    val got = Sq.sqAdcTopK(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("rerank recall@10 vs the exact-L2 baseline") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").filter($"embedding".isNotNull)
    val qvecs = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val exact = emb.join(broadcast(qvecs), $"vec_id" =!= $"query_id")
      .withColumn("l2sq",
        round(graft.functions.VectorExpressions.l2Sq($"embedding", $"q_emb"), 6))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"l2sq", $"vec_id")))
      .filter($"rk" <= 10)
      .select($"query_id", $"vec_id")
      .as[(Long, Long)].collect().toSet
    val got = Sq.sqRerankTopK(spark, sf)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"SQ8 rerank recall@10 = $recall")
  }

  test("persisted index: append encodes with the FROZEN grid; indexed probe equals the in-memory ranking") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").filter($"embedding".isNotNull)
    val model = Sq.fit(emb)
    val dir = java.nio.file.Files.createTempDirectory("graft_sq_spec").toString
    Sq.writeSqIndex(emb.filter($"vec_id" % 2 === 0), model, dir)
    Sq.appendToSqIndex(emb.filter($"vec_id" % 2 === 1), dir)
    // grid round-trips exactly and the append never refits: every code
    // equals a fresh encode under the same grid
    val loaded = Sq.loadSqModel(spark, dir)
    assert(loaded.mins.toSeq == model.mins.toSeq &&
      loaded.scales.toSeq == model.scales.toSeq, "grid round-trip")
    val got = spark.read.parquet(s"$dir/codes")
      .as[(Long, Seq[Int])].collect().toMap
    val fresh = Sq.encode(emb, model).as[(Long, Seq[Int])].collect().toMap
    assert(got == fresh, "append must encode with the frozen grid")
    // the standing-index entry returns exactly the in-memory entry's rows
    // (same oracle by construction)
    val viaIndex = Sq.sqAdcTopKIndexed(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    val inMem = Sq.sqAdcTopK(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaIndex == inMem)
    assert(viaIndex.nonEmpty)
  }
}
