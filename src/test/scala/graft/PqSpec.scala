package graft

import graft.operators.{Pq, Similarity}


/** Product quantization (builder-brief north star): encode correctness
  * against a driver-side re-derivation, ADC expression vs naive lookup,
  * determinism, and recall floors for both flat-ADC and IVF×PQ against the
  * exact L2 baseline. */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = graft.sources.Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding")
  private lazy val model = Pq.train(emb)
  private lazy val raw: Map[Long, Array[Double]] = emb.collect()
    .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  test("geometry + determinism: 8 codes in [0,64), retrain is identical") {
    assert(model.numSubspaces == 8 && model.k == 64 && model.dsub == 8)
    val codes = Pq.encode(emb, model).as[(Long, Seq[Int])].collect()
    assert(codes.length == raw.size)
    assert(codes.forall { case (_, c) =>
      c.length == 8 && c.forall(x => x >= 0 && x < 64) })
    val again = Pq.train(emb)
    assert(model.codebooks.flatten.flatten.toSeq ==
      again.codebooks.flatten.flatten.toSeq)
  }

  test("codegen encode matches a driver-side argmin re-derivation") {
    val got = Pq.encode(emb, model).as[(Long, Seq[Int])].collect().toMap
    raw.foreach { case (id, v) =>
      val want = (0 until model.numSubspaces).map { m =>
        val off = m * model.dsub
        (0 until model.k).minBy { c =>
          val w = model.codebooks(m)(c)
          var d = 0.0
          var j = 0
          while (j < model.dsub) { val t = v(off + j) - w(j); d += t * t; j += 1 }
          d // minBy keeps the first minimum, same rule as the expression
        }
      }
      assert(got(id) == want, s"vec $id")
    }
  }

  test("ADC expression equals the naive table lookup, and lower-bounds quality") {
    val q = raw(0L).map(_.toFloat).toSeq
    val dtab = model.distanceTable(q)
    val codes = Pq.encode(emb, model).as[(Long, Seq[Int])].collect()
    val spark2 = spark
    import spark2.implicits._
    val viaExpr = codes.toSeq.toDF("vec_id", "codes")
      .select($"vec_id", graft.functions.VectorExpressions.pqAdc(
        $"codes", org.apache.spark.sql.functions.typedLit(dtab.toSeq), model.k)
        .as("adc"))
      .as[(Long, Double)].collect().toMap
    codes.foreach { case (id, c) =>
      val want = (0 until model.numSubspaces)
        .map(m => dtab(m * model.k + c(m))).sum
      assert(viaExpr(id) == want, s"vec $id")
    }
  }

  /** Exact squared-L2 top-k on the driver (fixture-scale), self excluded. */
  private def exactTopK(qid: Long, k: Int): Set[Long] = {
    val q = raw(qid)
    raw.toSeq.filter(_._1 != qid)
      .map { case (id, v) =>
        var d = 0.0
        var j = 0
        while (j < v.length) { val t = v(j) - q(j); d += t * t; j += 1 }
        (id, d)
      }
      .sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSet
  }

  private def recallOf(result: Array[(Long, Long, Double, Long)], k: Int): Double = {
    val byQ = result.groupBy(_._1)
    byQ.map { case (qid, rows) =>
      val exact = exactTopK(qid, k)
      rows.count(r => exact(r._2)).toDouble / k
    }.sum / byQ.size
  }

  test("flat ADC top-k: recall@10 >= 0.25 vs exact L2; ranks well-formed") {
    val rows = Pq.pqAdcTopK(spark, sf).as[(Long, Long, Double, Long)].collect()
    assert(rows.forall { case (q, v, _, _) => q != v })
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq == (1L to 10L))
    }
    val rec = recallOf(rows, 10)
    assert(rec >= 0.25, s"flat ADC recall@10 $rec < 0.25")
  }

  test("shortlist + exact rerank recovers recall: >= 0.65, and > flat ADC") {
    val rerank = Pq.pqRerankTopK(spark, sf).as[(Long, Long, Double, Long)].collect()
    assert(rerank.forall { case (q, v, _, _) => q != v })
    val rr = recallOf(rerank, 10)
    val flat = recallOf(
      Pq.pqAdcTopK(spark, sf).as[(Long, Long, Double, Long)].collect(), 10)
    assert(rr >= 0.65, s"rerank recall@10 $rr < 0.65")
    assert(rr > flat, s"rerank $rr did not improve on flat ADC $flat")
  }

  test("persisted index: append encodes with FROZEN codebooks; probe reads the union") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_spec").toString
    val half = emb.filter($"vec_id" % 2 === 0)
    val rest = emb.filter($"vec_id" % 2 === 1)
    Pq.writePqIndex(half, model, dir)
    Pq.appendToPqIndex(rest, dir)
    val loadedModel = Pq.loadPqModel(spark, dir)
    assert(loadedModel.codebooks.flatten.flatten.toSeq ==
      model.codebooks.flatten.flatten.toSeq, "codebooks round-trip")
    val loaded = spark.read.parquet(s"$dir/codes")
    assert(loaded.count() == emb.count(), "append must be a union")
    // appended rows carry exactly the codes a fresh encode under the same
    // (frozen) codebooks produces — append never retrains
    val got = loaded.as[(Long, Seq[Int])].collect().toMap
    val fresh = Pq.encode(emb, model).as[(Long, Seq[Int])].collect().toMap
    assert(got == fresh)
    // probing the persisted index equals the in-memory ADC ranking
    val queries = emb.filter($"vec_id" < 5).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val viaIndex = Pq.adcTopK(loaded, loadedModel, queries)
      .as[(Long, Long, Double, Long)].collect().toSet
    val inMem = Pq.adcTopK(Pq.encode(emb, model), model, queries)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(viaIndex == inMem)
  }

  test("standing probe prune: an all-NaN query keeps the batch NaN-last, id-tiebreak order") {
    // every ADC distance of an all-NaN query is NaN, so the serving fold's
    // reject bound sees a NaN worst-kept score the moment the buffer
    // saturates — the prune must stand aside (NaN comparisons are all
    // false) and let the id tiebreak decide, or the serving rows diverge
    // from the batch path's pinned (adc NaN-last, vec_id) order
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_nan").toString
    Pq.writePqIndex(emb, model, dir)
    val standing = Pq.preparePqIndex(spark, dir)
    val nanQ = Seq((7777777L, Seq.fill(64)(Float.NaN).toSeq))
    // NaN breaks tuple equality (primitive NaN != NaN), so compare on the
    // canonical bit pattern — the scores here are EXPECTED to all be NaN
    def norm(rows: Array[(Long, Long, Double, Long)]) = rows
      .map { case (q, v, a, r) =>
        (q, v, java.lang.Double.doubleToLongBits(a), r) }.toSet
    val batch = norm(Pq.adcTopK(spark.read.parquet(s"$dir/codes"), model, nanQ)
      .as[(Long, Long, Double, Long)].collect())
    val serving = norm(Pq.queryStandingPq(standing,
      nanQ.toDF("vec_id", "embedding"))
      .as[(Long, Long, Double, Long)].collect())
    assert(serving == batch)
    assert(serving.size == 10,
      s"NaN query must still fill k by id tiebreak, got ${serving.size}")
  }

  test("standing probe bounds the query batch: oversized batches CHUNK with identical results, duplicates dedupe, only the hard cap throws") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_guard").toString
    Pq.writePqIndex(emb, model, dir)
    val standing = Pq.preparePqIndex(spark, dir)
    val queries = emb.filter($"vec_id" < 5)
    val oneShot = Pq.queryStandingPq(standing, queries, k = 3,
      maxQueryBatch = 5).as[(Long, Long, Double, Long)].collect().toSet
    assert(oneShot.nonEmpty)
    // past maxQueryBatch: a backlogged trigger must NOT kill the serving
    // loop (a crash there replays the same offsets forever) — the batch
    // chunks into bounded broadcasts and the results are identical
    val chunked = Pq.queryStandingPq(standing, queries, k = 3,
      maxQueryBatch = 2).as[(Long, Long, Double, Long)].collect().toSet
    assert(chunked == oneShot, "chunked serving diverged from one-shot")
    // a duplicated query id within one trigger (a client retry landing
    // twice in a backlogged batch) serves ONCE — folding it twice would
    // emit the same vec_id at two ranks
    val dup = Pq.queryStandingPq(standing, queries.union(queries), k = 3,
      maxQueryBatch = 5).as[(Long, Long, Double, Long)].collect()
    assert(dup.toSet == oneShot && dup.length == oneShot.size,
      "duplicate query ids must serve exactly once")
    // only the HARD driver-materialization cap (16 × maxQueryBatch) fails,
    // and the limit+1 plan means the driver never collected past it
    val e = intercept[IllegalArgumentException] {
      Pq.queryStandingPq(standing, emb.select($"vec_id", $"embedding"),
        k = 3, maxQueryBatch = 1)
    }
    assert(e.getMessage.contains("CHUNKED serving cap"), e.getMessage)
    // the composed twin shares the same collection contract
    val dir2 = java.nio.file.Files.createTempDirectory("graft_ivfpq_guard").toString
    val index = Similarity.buildIvfIndex(emb)
    Pq.writeIvfPqIndex(index.bucketed, model, index.centers, dir2)
    val standing2 = Pq.prepareIvfPqIndex(spark, dir2)
    val one2 = Pq.queryStandingIvfPq(standing2, queries, k = 3)
      .as[(Long, Long, Double, Long)].collect().toSet
    val chunked2 = Pq.queryStandingIvfPq(standing2, queries, k = 3,
      maxQueryBatch = 2).as[(Long, Long, Double, Long)].collect().toSet
    assert(chunked2 == one2 && one2.nonEmpty,
      "composed chunked serving diverged from one-shot")
    val dup2 = Pq.queryStandingIvfPq(standing2, queries.union(queries),
      k = 3).as[(Long, Long, Double, Long)].collect()
    assert(dup2.toSet == one2 && dup2.length == one2.size,
      "composed: duplicate query ids must serve exactly once")
  }

  test("composed index: frozen-stage append lands in the probed cells and surfaces at the next standing probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_spec").toString
    val index = Similarity.buildIvfIndex(emb.filter($"vec_id" % 2 === 0))
    Pq.writeIvfPqIndex(index.bucketed, model, index.centers, dir)
    // append with BOTH stages frozen: assign to existing centroids, encode
    // with existing codebooks
    Pq.appendToIvfPqIndex(emb.filter($"vec_id" % 2 === 1), dir)
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.count() == emb.count(), "append must be a union")
    assert(codes.select($"vec_id").distinct().count() == codes.count())
    // a vector appended AT a query's own embedding has ADC distance 0 —
    // a fresh standing probe must surface it first (the per-probe listing
    // sees the appended files without re-preparing)
    val standing = Pq.prepareIvfPqIndex(spark, dir)
    val (qid, qemb) = emb.filter($"vec_id" < 1).as[(Long, Seq[Float])]
      .collect().head
    Pq.appendToIvfPqIndex(Seq((880000L, qemb)).toDF("vec_id", "embedding"), dir)
    val top = Pq.queryStandingIvfPq(standing,
      Seq((qid, qemb)).toDF("vec_id", "embedding"))
      .as[(Long, Long, Double, Long)].collect()
    assert(top.exists(r => r._2 == 880000L && r._4 == 1L),
      s"appended twin not surfaced first: ${top.sortBy(_._4).take(3).toSeq}")
  }

  test("IVF×PQ top-k: recall@10 >= 0.25 vs exact L2; ranks well-formed") {
    val rows = Pq.ivfPqTopK(spark, sf).as[(Long, Long, Double, Long)].collect()
    assert(rows.forall { case (q, v, _, _) => q != v })
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq == (1L to 10L))
    }
    val rec = recallOf(rows, 10)
    assert(rec >= 0.25, s"IVF×PQ recall@10 $rec < 0.25")
  }

  test("residual encode matches a driver-side re-derivation (widen, subtract, argmin)") {
    val index = Similarity.standingIndex(spark, sf)
    val rmodel = Pq.trainResidual(index)
    val got = Pq.encodeResidual(index, rmodel)
      .as[(Long, Seq[Int], Int)].collect().map(r => r._1 -> r._2).toMap
    val cells = index.bucketed.select($"vec_id", $"cell")
      .as[(Long, Int)].collect().toMap
    assert(got.size == raw.size)
    raw.foreach { case (id, _) =>
      // re-widen from the float source: the expression sees floats, and
      // double-rounded inputs would not be the same arithmetic
      val vf = emb.filter($"vec_id" === id).as[(Long, Seq[Float])].head()._2
      val ctr = index.centers(cells(id))
      val res = Array.tabulate(vf.length)(j => vf(j).toDouble - ctr(j))
      val want = (0 until rmodel.numSubspaces).map { m =>
        val off = m * rmodel.dsub
        (0 until rmodel.k).minBy { c =>
          val w = rmodel.codebooks(m)(c)
          var d = 0.0
          var j = 0
          while (j < rmodel.dsub) { val t = res(off + j) - w(j); d += t * t; j += 1 }
          d
        }
      }
      assert(got(id) == want, s"vec $id")
    }
  }

  test("residual distortion strictly dominates raw in EVERY subspace at the same code budget") {
    // the registered justification of the residual tier: coarse residuals
    // have less spread than the raw corpus, so the same 8×64 codebooks
    // quantize them with lower distortion — if this ever flips, the tier
    // is mis-trained (e.g. residuals computed against the wrong centers)
    val rawErr = Pq.pqQuantError(spark, sf)
      .select($"subspace", $"mean_err_micros")
      .as[(Long, Long)].collect().toMap
    val resErr = Pq.pqResidualQuantError(spark, sf)
      .select($"subspace", $"mean_err_micros")
      .as[(Long, Long)].collect().toMap
    assert(rawErr.keySet == resErr.keySet && rawErr.size == 8)
    rawErr.foreach { case (m, e) =>
      assert(resErr(m) < e,
        s"subspace $m: residual distortion ${resErr(m)} !< raw $e")
    }
  }

  test("residual IVF×PQ top-k: recall floor, well-formed ranks, deterministic re-run") {
    val rows = Pq.ivfPqResidualTopK(spark, sf)
      .as[(Long, Long, Double, Long)].collect()
    assert(rows.forall { case (q, v, _, _) => q != v })
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq == (1L to 10L))
    }
    val rec = recallOf(rows, 10)
    assert(rec >= 0.25, s"residual IVF×PQ recall@10 $rec < 0.25")
    // recall parity with the raw composition is scale-dependent (both
    // legs share the coarse prune, which dominates top-10 loss on this
    // 500-vector fixture); the distortion test above is the invariant
    // claim, and pq_residual_recall the registered side-by-side
    val again = Pq.ivfPqResidualTopK(spark, sf)
      .as[(Long, Long, Double, Long)].collect()
    assert(rows.sortBy(r => (r._1, r._4)).toSeq ==
      again.sortBy(r => (r._1, r._4)).toSeq)
  }
}
