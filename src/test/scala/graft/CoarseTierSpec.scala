package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}
import graft.sources.Tables

/** The coarse probe tier as a SERVING DEFAULT (round-17): the auto-ncoarse
  * policy in the index writers/retrains, the stale-medium removal on a flat
  * rewrite, the centers-only migration helper, and the two-level cell
  * choice through the COMPOSED standing probes. The registered
  * `ivf_pq_topk_coarse` entry hash-checks the composed replay; this suite
  * pins the policy edges and the choice-equivalence the oracle can't see:
  * serving choice ≡ [[Similarity.probeCellsCoarseRanked]], and the
  * wCoarse = ncoarse degeneration to the flat choice. */
class CoarseTierSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def emb = graft.util.Cols.spread(Tables.embeddings(spark, sf))
    .select($"vec_id", $"embedding")

  private def coarseDir(path: String) =
    java.nio.file.Files.exists(java.nio.file.Paths.get(path, "coarse"))

  test("writeIvfIndex default: coarse tier engages at serving nlist (auto ncoarse = ceil(sqrt(nlist))), stays flat below the threshold") {
    val flat = tmp("graft-coarse-flat16")
    Similarity.writeIvfIndex(Similarity.buildIvfIndex(emb, nlist = 16), flat)
    assert(!coarseDir(flat), "nlist=16 is below the auto threshold")
    assert(Similarity.prepareIvfIndex(spark, flat).coarse.isEmpty)

    val serving = tmp("graft-coarse-auto32")
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb, nlist = 32), serving)
    assert(coarseDir(serving), "nlist=32 must engage the auto policy")
    val cq = Similarity.prepareIvfIndex(spark, serving).coarse
    assert(cq.nonEmpty)
    assert(cq.get.coarseCenters.length == 6, // ceil(sqrt(32))
      s"auto ncoarse: expected 6, got ${cq.get.coarseCenters.length}")
    assert(cq.get.cellToCoarse.length == 32)
    // the engaged index still serves (two-level in-plan choice)
    val queries = emb.filter($"vec_id" < 3)
    assert(Similarity.queryStandingIvf(
      Similarity.prepareIvfIndex(spark, serving), queries).count() > 0)
  }

  test("a FLAT rewrite removes a stale coarse medium — the new geometry cannot serve the old quantizer") {
    val path = tmp("graft-coarse-stale")
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb, nlist = 16), path, ncoarse = 4)
    assert(coarseDir(path))
    // rebuild FLAT at a different nlist over the same path: without the
    // removal the stale cell→super-cell map (16 cells) would misdirect —
    // or index-out-of-bounds against — the new 8-cell geometry
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb, nlist = 8), path, ncoarse = 0)
    assert(!coarseDir(path), "flat rewrite left a stale coarse/ behind")
    val standing = Similarity.prepareIvfIndex(spark, path)
    assert(standing.coarse.isEmpty)
    assert(Similarity.queryStandingIvf(standing,
      emb.filter($"vec_id" < 3)).count() > 0)
  }

  test("deriveCoarseTier migrates a flat index from its centers alone; probes agree with the coarse-written twin") {
    val flat = tmp("graft-coarse-migrate")
    val twin = tmp("graft-coarse-twin")
    val index = Similarity.buildIvfIndex(emb, nlist = 16)
    Similarity.writeIvfIndex(index, flat, ncoarse = 0)
    Similarity.writeIvfIndex(index, twin, ncoarse = 4)
    assert(Similarity.deriveCoarseTier(spark, flat, ncoarse = 4) == 4)
    assert(coarseDir(flat))
    val queries = emb.filter($"vec_id" < 4)
    def rows(p: String) = Similarity.queryStandingIvf(
        Similarity.prepareIvfIndex(spark, p), queries)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(rows(flat) == rows(twin),
      "a migrated coarse tier must serve exactly like a coarse-written one")
    // below the threshold with the auto default: explicit no-op
    val small = tmp("graft-coarse-small")
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb, nlist = 16), small, ncoarse = 0)
    assert(Similarity.deriveCoarseTier(spark, small) == 0)
    assert(!coarseDir(small))
  }

  test("retrainIvfIndex AUTO-ENGAGES the tier for a flat index at serving nlist (the new medium rides the swap)") {
    val path = tmp("graft-coarse-retrain")
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb, nlist = 32), path, ncoarse = 0)
    assert(!coarseDir(path))
    Similarity.retrainIvfIndex(spark, path)
    assert(coarseDir(path),
      "retrain of a flat serving-geometry index must engage the tier")
    val cq = Similarity.prepareIvfIndex(spark, path).coarse
    assert(cq.nonEmpty && cq.get.coarseCenters.length == 6)
    assert(Similarity.queryStandingIvf(
        Similarity.prepareIvfIndex(spark, path),
        emb.filter($"vec_id" < 3)).count() > 0)
  }

  test("composed standing probe: cell choice goes through the persisted quantizer (≡ probeCellsCoarseRanked); wCoarse = ncoarse degenerates to the flat choice") {
    val model = Pq.train(emb)
    val index = Similarity.buildIvfIndex(emb, nlist = 16)
    val coarse = tmp("graft-coarse-comp")
    val flat = tmp("graft-coarse-comp-flat")
    Pq.writeIvfPqIndex(index.bucketed, model, index.centers, coarse,
      ncoarse = 4)
    Pq.writeIvfPqIndex(index.bucketed, model, index.centers, flat,
      ncoarse = 0)
    val sc = Pq.prepareIvfPqIndex(spark, coarse)
    val sf0 = Pq.prepareIvfPqIndex(spark, flat)
    assert(sc.coarse.nonEmpty && sf0.coarse.isEmpty)
    // the combined signature covers the coarse medium: the two handles
    // cannot alias a serving loop's currency check
    assert(sc.sig != sf0.sig)
    val queries = emb.filter($"vec_id" < 5)
    val qseq = queries.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    // choice ≡ the driver-side two-level ranking, rank-stripped
    assert(Similarity.probeCellsForStanding(sc.centers, sc.coarse, qseq,
        nprobe = 4, wCoarse = 2) ==
      Similarity.probeCellsCoarseRanked(sc.centers, sc.coarse.get, qseq,
        maxNprobe = 4, wCoarse = 2).map { case (q, c, _) => (q, c) })
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    // degeneration: opening every super-cell IS the flat exact choice
    assert(rows(Pq.queryStandingIvfPq(sc, queries, wCoarse = 4)) ==
      rows(Pq.queryStandingIvfPq(sf0, queries)),
      "wCoarse = ncoarse must reproduce the flat composed probe")
    // and the default wCoarse serves the coarse-chosen cells: the batch
    // scoring dag over exactly those cells must agree with the fold
    val probes = Similarity.probeCellsForStanding(sc.centers, sc.coarse,
      qseq, nprobe = 4, wCoarse = 2)
    val byId = qseq.toMap
    val withTabs = probes.map { case (qid, cell) =>
      (qid, cell, model.distanceTable(byId(qid)).toSeq) }
    val queryCells = spark.createDataFrame(withTabs)
      .toDF("query_id", "cell", "dtab")
    val coded = index.bucketed.select($"vec_id",
      graft.functions.VectorExpressions
        .pqCodes($"embedding", model.codebooks).as("codes"), $"cell")
    val pruned = coded.filter($"cell".isin(probes.map(_._2).distinct: _*))
    val scored = pruned.join(broadcast(queryCells),
        pruned("cell") === queryCells("cell") && $"vec_id" =!= $"query_id")
      .withColumn("adc", round(graft.functions.VectorExpressions
        .pqAdc($"codes", $"dtab", model.k), 6))
      .select($"query_id", $"vec_id", $"adc")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"adc", $"vec_id")
    val expected = scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 10)
    assert(rows(Pq.queryStandingIvfPq(sc, queries)) == rows(expected),
      "the composed serving fold must score exactly the coarse-chosen cells")
  }

  test("composed RESIDUAL standing probe serves through the coarse tier; wCoarse = ncoarse degenerates to the flat residual probe") {
    val index = Similarity.buildIvfIndex(emb, nlist = 16)
    val model = Pq.trainResidual(index)
    val coarse = tmp("graft-coarse-res")
    val flat = tmp("graft-coarse-res-flat")
    Pq.writeIvfPqResidualIndex(index, model, coarse, ncoarse = 4)
    Pq.writeIvfPqResidualIndex(index, model, flat, ncoarse = 0)
    val sc = Pq.prepareIvfPqIndex(spark, coarse)
    val sf0 = Pq.prepareIvfPqIndex(spark, flat)
    assert(sc.coarse.nonEmpty && sf0.coarse.isEmpty)
    val queries = emb.filter($"vec_id" < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(rows(Pq.queryStandingIvfPqResidual(sc, queries, wCoarse = 4)) ==
      rows(Pq.queryStandingIvfPqResidual(sf0, queries)),
      "wCoarse = ncoarse must reproduce the flat residual probe")
    assert(Pq.queryStandingIvfPqResidual(sc, queries).count() > 0)
  }

  test("the IVF drift monitor watches coarse-assignment consistency: exact tallies, flat-index None, durable across restart, reset by resync") {
    import graft.streaming.AnnStream
    val path = tmp("graft-coarse-watch")
    // auto-engaged geometry: the monitor must find and score the quantizer
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb.filter($"vec_id" % 2 === 0),
        nlist = 32), path)
    val stateDir = tmp("graft-coarse-watch-state")
    val monitor = AnnStream.prepareRetrainMonitor(spark, path,
      healthFloorMicros = Long.MinValue, stateDir = Some(stateDir))
    assert(monitor.coarseConsistencyMicros.isEmpty, "no vector scored yet")
    val batch = emb.filter($"vec_id" % 2 === 1 && $"vec_id" < 101)
    AnnStream.processIngestBatch(monitor, batch, 0L) { (r, _) =>
      val _ = r.count()
    }
    val got = monitor.coarseConsistencyMicros
    assert(got.nonEmpty)
    // exact driver-side recomputation at the watch's serving defaults
    val standing = Similarity.prepareIvfIndex(spark, path)
    val cq = standing.coarse.get
    val qs = batch.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val flat = Similarity.probeCellsFor(standing.centers, qs,
        monitor.CoarseWatchNprobe)
      .groupBy(_._1).map { case (q, cs) => q -> cs.map(_._2).toSet }
    val two = Similarity.probeCellsCoarseRanked(standing.centers, cq, qs,
        monitor.CoarseWatchNprobe, monitor.CoarseWatchWCoarse)
      .groupBy(_._1).map { case (q, cs) => q -> cs.map(_._2).toSet }
    val overlap = qs.map { case (q, _) =>
      flat(q).intersect(two(q)).size.toLong }.sum
    val want = 1000000L * overlap /
      (qs.length.toLong * monitor.CoarseWatchNprobe)
    assert(got.get == want, s"got ${got.get}, want $want")
    // the tallies persist with the monitor state (crash-restart seed)
    val seeded = AnnStream.prepareRetrainMonitor(spark, path,
      healthFloorMicros = Long.MinValue, stateDir = Some(stateDir))
    assert(seeded.coarseConsistencyMicros.contains(want))
    // a retrain (signature change) resets the pairing-scoped tallies at
    // the next slot's resync — delivered here as an EMPTY batch
    Similarity.retrainIvfIndex(spark, path)
    AnnStream.processIngestBatch(monitor,
      emb.filter($"vec_id" < 0), 1L) { (r, _) => val _ = r.count() }
    assert(monitor.coarseConsistencyMicros.isEmpty)
    // a FLAT index never tallies: the watch is coarse-medium-scoped
    val flatPath = tmp("graft-coarse-watch-flat")
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb, nlist = 16), flatPath)
    val flatMon = AnnStream.prepareRetrainMonitor(spark, flatPath,
      healthFloorMicros = Long.MinValue)
    AnnStream.processIngestBatch(flatMon,
      emb.filter($"vec_id" < 10), 0L) { (r, _) => val _ = r.count() }
    assert(flatMon.coarseConsistencyMicros.isEmpty)
  }

  test("composed retrains carry the tier: an engaged index refits it, a flat serving-geometry index engages it") {
    val model = Pq.train(emb)
    val index = Similarity.buildIvfIndex(emb, nlist = 32)
    val path = tmp("graft-coarse-comp-retrain")
    Pq.writeIvfPqIndex(index.bucketed, model, index.centers, path,
      ncoarse = 0)
    // seed the raw refit corpus the retrain contract requires
    emb.write.mode("overwrite").parquet(s"$path/raw")
    assert(!coarseDir(path))
    Pq.retrainIvfPqIndex(spark.read.parquet(s"$path/raw"), path)
    assert(coarseDir(path),
      "composed retrain at serving nlist must engage the tier")
    val standing = Pq.prepareIvfPqIndex(spark, path)
    assert(standing.coarse.nonEmpty &&
      standing.coarse.get.coarseCenters.length == 6)
    assert(Pq.queryStandingIvfPq(standing,
      emb.filter($"vec_id" < 3)).count() > 0)
  }
}
