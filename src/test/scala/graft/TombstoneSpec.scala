package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Similarity}
import graft.sources.Tables
import graft.util.{BatchAppend, Tombstones}

/** The DELETE contract for standing indexes (round-15 stretch): tombstone
  * rows folded at probe, physically absorbed at compaction, with the
  * carry-fence interplay. The absorbed end states are oracle-checked
  * (`ivf_topk_deleted`, `bm25_topk_deleted` share their batch oracles);
  * this suite pins the PRE-absorb fold, delete visibility, the (N, Σdl)
  * correction, and the carried-file masking rule those entries can't
  * exercise. */
class TombstoneSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("IVF: a tombstone folds out of the next probe with no rewrite; absorb is physical and retires a carry-free tombstone set") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = tmp("graft-ts-ivf")
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb.filter($"vec_id" % 4 =!= 3)), path)
    val queries = emb.filter($"vec_id" % 4 === 3).limit(4)
    def probe() = Similarity.queryStandingIvf(
        Similarity.prepareIvfIndex(spark, path), queries)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val before = probe()
    // junk lands and disturbs the ranking…
    val junk = emb.filter($"vec_id" % 4 === 1)
      .select(($"vec_id" + 5000000L).as("vec_id"), $"embedding")
    Similarity.appendToIvfIndex(junk, path)
    assert(probe() != before, "fixture degenerate: junk never ranked")
    // …the delete is ONE tombstone append — no index rewrite — and the
    // very next probe excludes every junk id
    val rowsBefore = spark.read.parquet(s"$path/corpus").count()
    Similarity.deleteFromIvfIndex(junk.select($"vec_id"), path)
    assert(spark.read.parquet(s"$path/corpus").count() == rowsBefore,
      "delete must not rewrite the corpus")
    assert(probe() == before, "tombstoned rows leaked into the probe")
    // absorb: the rewrite drops the rows physically, carry-free → the
    // tombstone directory retires and probes stay identical
    val stats = Similarity.absorbIvfDeletes(spark, path)
    assert(stats.rows > 0L)
    assert(!Tombstones.exists(spark, path))
    assert(spark.read.parquet(s"$path/corpus")
      .filter($"vec_id" >= 5000000L).count() == 0L, "absorb left junk rows")
    assert(probe() == before)
  }

  test("IVF absorb under a carry fence: carried files keep masking via kept tombstones; a later carry-free absorb retires them") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = tmp("graft-ts-fence")
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb.filter($"vec_id" % 4 === 0)), path)
    val queries = emb.filter($"vec_id" % 4 === 3).limit(4)
    def probe() = Similarity.queryStandingIvf(
        Similarity.prepareIvfIndex(spark, path), queries)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val before = probe()
    // the junk batch arrives THROUGH the tagged ingest protocol (batch 7)
    // and is then retracted while still above the compaction fence
    val junk = emb.filter($"vec_id" % 4 === 1)
      .select(($"vec_id" + 5000000L).as("vec_id"), $"embedding")
    val centers = Similarity.loadIvfIndex(spark, path).centers
    BatchAppend.append(
      junk.select($"vec_id", $"embedding",
        graft.functions.VectorExpressions
          .nearestCenter($"embedding", centers).as("cell")),
      s"$path/corpus", BatchAppend.tag(7L), partitionCol = Some("cell"))
    Similarity.deleteFromIvfIndex(junk.select($"vec_id"), path)
    // absorb with batch 7 still replayable: its files carry verbatim, so
    // the tombstones MUST survive to keep masking the carried rows
    val stats = Similarity.absorbIvfDeletes(spark, path,
      safeBatchFence = Some(6L))
    assert(stats.carriedFiles > 0L, "fixture degenerate: nothing carried")
    assert(Tombstones.exists(spark, path),
      "tombstones retired while carried files still hold masked rows")
    assert(spark.read.parquet(s"$path/corpus")
      .filter($"vec_id" >= 5000000L).count() > 0L) // physically present…
    assert(probe() == before) // …but still masked
    // once the batch is committed (fence advances), the next absorb is
    // carry-free: rows drop, tombstones retire
    val stats2 = Similarity.absorbIvfDeletes(spark, path,
      safeBatchFence = Some(7L))
    assert(stats2.carriedFiles == 0L)
    assert(!Tombstones.exists(spark, path))
    assert(spark.read.parquet(s"$path/corpus")
      .filter($"vec_id" >= 5000000L).count() == 0L)
    assert(probe() == before)
  }

  test("BM25: delete corrects (N, Σdl) and the candidate slice — probe ≡ a fresh index over the retained corpus; signature fires for serving") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val path = tmp("graft-ts-bm25")
    writeAll(docs, path)
    val queries = docs.filter($"doc_id" < 3)
      .select($"doc_id".as("query_id"), $"text")
    // retract a REAL slice of the corpus (docs 5..9 — in-corpus deletes,
    // harder than retracting junk: N, Σdl, df, and rankings all shift for
    // every remaining doc) plus one empty doc if present
    val deleted = docs.filter($"doc_id" >= 5L && $"doc_id" < 10L)
      .select($"doc_id")
    val sigBefore = Bm25.statsSignature(spark, path)
    Bm25.deleteFromBm25Index(spark, path, deleted)
    assert(Bm25.statsSignature(spark, path) != sigBefore,
      "a delete must change the serving currency signature")
    // the reference: a FRESH index over exactly the retained corpus — the
    // tombstoned probe must be bit-equal (constants correction included;
    // a missed N correction shifts every idf and fails this)
    val refPath = tmp("graft-ts-bm25-ref")
    writeAll(docs.join(deleted, Seq("doc_id"), "left_anti"), refPath)
    val got = Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq
    val want = Bm25.queryBm25Index(spark, refPath, queries)
      .collect().map(_.toSeq).toSeq
    assert(got == want, s"${got.take(3)} vs ${want.take(3)}")
    val deletedIds = deleted.as[Long].collect().toSet
    assert(!got.exists(r => deletedIds.contains(r(2).asInstanceOf[Long])))
    // double delete of the same ids: idempotent (dedup at fold)
    Bm25.deleteFromBm25Index(spark, path, deleted)
    assert(Bm25.queryBm25Index(spark, path, queries)
      .collect().map(_.toSeq).toSeq == want, "double delete double-counted")
  }

  private def writeAll(docs: org.apache.spark.sql.DataFrame,
      path: String): Unit = Bm25.writeBm25Index(docs, path)

  test("code tiers (PQ / IVF×PQ / SQ8): a tombstone folds out of every standing probe with no rewrite") {
    import graft.operators.{Pq, Sq}
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
      .filter($"embedding".isNotNull)
    val corpus = emb.filter($"vec_id" % 4 =!= 3)
    val queries = emb.filter($"vec_id" % 4 === 3).limit(3)
    // mid-corpus ids whose retraction must change nothing but their absence
    val dead = corpus.filter($"vec_id" % 7 === 0).select($"vec_id")
    val deadIds = dead.as[Long].collect().toSet
    val retained = corpus.join(dead, Seq("vec_id"), "left_anti")

    // PQ: probe after delete ≡ probe of an index built over the retained
    // corpus (same codebooks — the model is trained once on the full set,
    // deletion is row-level, not model-level)
    val model = Pq.train(corpus)
    val pqA = tmp("graft-ts-pq"); val pqB = tmp("graft-ts-pq-ref")
    Pq.writePqIndex(corpus, model, pqA)
    Pq.writePqIndex(retained, model, pqB)
    Pq.deleteFromPqIndex(dead, pqA)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(rows(Pq.queryStandingPq(Pq.preparePqIndex(spark, pqA), queries)) ==
      rows(Pq.queryStandingPq(Pq.preparePqIndex(spark, pqB), queries)))
    assert(!rows(Pq.queryStandingPq(Pq.preparePqIndex(spark, pqA), queries))
      .exists(r => deadIds.contains(r(1).asInstanceOf[Long])))

    // IVF×PQ: same contract through the cell-pruned composed fold (the
    // residual fold shares prunedCodes, so it inherits the same path)
    val index = Similarity.buildIvfIndex(corpus)
    val ivfpqA = tmp("graft-ts-ivfpq"); val ivfpqB = tmp("graft-ts-ivfpq-ref")
    Pq.writeIvfPqIndex(index.bucketed, model, index.centers, ivfpqA)
    Pq.writeIvfPqIndex(
      index.bucketed.join(dead, Seq("vec_id"), "left_anti"), model,
      index.centers, ivfpqB)
    Pq.deleteFromPqIndex(dead, ivfpqA)
    assert(rows(Pq.queryStandingIvfPq(
        Pq.prepareIvfPqIndex(spark, ivfpqA), queries)) ==
      rows(Pq.queryStandingIvfPq(
        Pq.prepareIvfPqIndex(spark, ivfpqB), queries)))

    // SQ8: same contract through the integer-L2 coded scan
    val sqModel = Sq.fit(corpus)
    val sqA = tmp("graft-ts-sq"); val sqB = tmp("graft-ts-sq-ref")
    Sq.writeSqIndex(corpus, sqModel, sqA)
    Sq.writeSqIndex(retained, sqModel, sqB)
    Sq.deleteFromSqIndex(dead, sqA)
    assert(rows(Sq.queryStandingSq(Sq.prepareSqIndex(spark, sqA), queries)) ==
      rows(Sq.queryStandingSq(Sq.prepareSqIndex(spark, sqB), queries)))
  }
}
