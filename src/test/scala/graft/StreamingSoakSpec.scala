package graft

import java.nio.file.Files

import graft.streaming.Soak

/** Streaming throughput floor gate (VERDICT r4 #6): drive the rate source
  * through the two always-on pipelines — the collection sink and the
  * watermarked windowed aggregation — and pin a non-degenerate throughput
  * floor. The recorded STREAMBENCH.json artifact is written by the
  * [[graft.StreamSoak]] main, which runs this same harness at both the
  * 4-core test geometry and the 32-core bench geometry.
  *
  * Rates are set well above the floor so a pass means the pipeline KEPT UP,
  * not merely ran: the collector must sustain ≥5k lines/sec of processing
  * throughput (filter → sanitize → per-batch text sink) and the stateful
  * hourly aggregation ≥20k events/sec, on the 4-core test session. The
  * floors are deliberately conservative so CI noise cannot flake them.
  */
class StreamingSoakSpec extends SparkTestBase {

  /** One re-measure on a floor miss: late in a full sequential test run the
    * shared JVM carries code-cache and GC pressure from the ~24 preceding
    * suites, and a transient spike can dip a healthy pipeline under its
    * floor (observed once in CI: solo pass, full-run miss). A genuinely
    * degenerate pipeline fails BOTH attempts, so the gate keeps its
    * meaning — the same re-measure-before-believing-a-regression policy as
    * Bench's stall detection. */
  private def measureWithRetry[A](attempt: Int => A)(floors: A => Unit): Unit =
    try floors(attempt(0))
    catch {
      case _: org.scalatest.exceptions.TestFailedException =>
        info("soak floor missed once; re-measuring (transient JVM pressure)")
        floors(attempt(1))
    }

  test("rate-source soak: collector and hourly aggregation sustain load") {
    measureWithRetry { _ =>
      val out = Files.createTempDirectory("graft-soak-collector")
      out.toFile.deleteOnExit()
      Soak.run(spark, 50000, 200000, out.toString)
    } { case (cSoak, sunk, hSoak) =>
      assert(cSoak.batches >= 2 && cSoak.totalRows > 20000, cSoak)
      assert(cSoak.rowsPerSec > 5000, s"collector throughput degenerate: $cSoak")
      // >= not ==: recentProgress is a BOUNDED buffer (default 100 entries),
      // so on a fast machine early batches silently age out of totalRows;
      // every reported row must still have reached the sink
      assert(sunk >= cSoak.totalRows, (sunk, cSoak))
      assert(hSoak.batches >= 2 && hSoak.totalRows > 50000, hSoak)
      assert(hSoak.rowsPerSec > 20000, s"agg throughput degenerate: $hSoak")
    }
  }

  test("rate-source soak: streaming dedup probe sustains the ingest loop") {
    // every micro-batch pays shingle -> 128-slot minhash -> banded join
    // against the persisted index -> exact verify; the floor is well below
    // a healthy 4-core rate so CI noise cannot flake it
    measureWithRetry { i =>
      Soak.dedupRun(spark, corpusDocs = 20000, docsRate = 5000,
        tag = s"spec$i")
    } { d =>
      assert(d.batches >= 2 && d.totalRows > 5000, d)
      assert(d.rowsPerSec > 500, s"dedup probe throughput degenerate: $d")
    }
  }

  test("rate-source soak: skewed dedup probe holds throughput under a planted hot key") {
    // 40% of the feed re-fetches ONE text standing at 2× the bucket cap
    // (band + hash buckets dropped at build — the cap is what keeps this
    // from going quadratic) and 10% hits a warm below-cap key that pairs
    // with all its standing twins; the same floor as the uniform probe
    measureWithRetry { i =>
      Soak.skewedDedupRun(spark, corpusDocs = 20000, docsRate = 5000,
        tag = s"spec$i")
    } { d =>
      assert(d.batches >= 2 && d.totalRows > 5000, d)
      assert(d.rowsPerSec > 500,
        s"skewed dedup probe throughput degenerate: $d")
    }
  }

  test("rate-source soak: streaming decontamination sustains the sweep") {
    // per micro-batch: 8-gram explode + broadcast probe of the prepared
    // benchmark + pair group-by; half the feed is all-hits (worst case for
    // the match side), half all-misses
    measureWithRetry { _ =>
      Soak.decontamRun(spark, benchDocs = 2000, docsRate = 20000)
    } { d =>
      assert(d.batches >= 2 && d.totalRows > 20000, d)
      assert(d.rowsPerSec > 2000, s"decontam throughput degenerate: $d")
    }
  }

  test("rate-source soak: ANN serving sustains the query stream") {
    // per micro-batch: driver probe-cell choice + directory-pruned index
    // scan + broadcast query scoring + salted top-k
    measureWithRetry { i =>
      Soak.annRun(spark, corpusVecs = 20000, queriesRate = 500,
        tag = s"spec$i")
    } { d =>
      assert(d.batches >= 2 && d.totalRows > 2000, d)
      assert(d.rowsPerSec > 300, s"ann probe throughput degenerate: $d")
      // serving-SLO latency floor: at a 4 s trigger, a healthy probe batch
      // completes well inside its interval even at p95 — a tail past 2
      // intervals means the loop is falling behind, whatever the mean says
      assert(d.p95BatchMs > 0 && d.p95BatchMs < 8000,
        s"ann probe p95 trigger latency degenerate: $d")
      assert(d.p50BatchMs <= d.p95BatchMs && d.p95BatchMs <= d.p99BatchMs &&
        d.p99BatchMs <= d.maxBatchMs, s"percentiles not monotone: $d")
    }
  }

  test("rate-source soak: PQ ADC serving sustains the query stream") {
    // per micro-batch: broadcast distance tables + the partition-local
    // ADC fold over the FULL codes artifact + ascending bounded top-k —
    // the compressed tier reads everything, so the floor prices the
    // 32×-smaller scan
    measureWithRetry { i =>
      Soak.pqRun(spark, corpusVecs = 20000, queriesRate = 500,
        tag = s"spec$i")
    } { d =>
      assert(d.batches >= 2 && d.totalRows > 2000, d)
      assert(d.rowsPerSec > 300, s"pq probe throughput degenerate: $d")
    }
  }

  test("rate-source soak: residual IVF×PQ serving sustains the query stream") {
    // the FAISS-IVFADC serving shape: cell-pruned compressed scan with
    // per-(query, cell) tables built inside the fold — the distortion
    // win must not cost the composed tier its throughput floor
    measureWithRetry { i =>
      Soak.ivfPqResidualRun(spark, corpusVecs = 20000, queriesRate = 500,
        tag = s"spec$i")
    } { d =>
      assert(d.batches >= 2 && d.totalRows > 2000, d)
      assert(d.rowsPerSec > 300, s"residual composed probe degenerate: $d")
    }
  }

  test("rate-source soak: BM25 lexical serving sustains the query stream") {
    // per micro-batch: tokenize, bucket-pruned postings scan, idf
    // broadcast from the pruned slice, exact-integer scoring, top-k —
    // the retrieval tier priced next to the vector tiers' serving rows
    measureWithRetry { i =>
      Soak.bm25Run(spark, corpusDocs = 20000, queriesRate = 500,
        tag = s"spec$i")
    } { d =>
      assert(d.batches >= 2 && d.totalRows > 2000, d)
      assert(d.rowsPerSec > 300, s"bm25 probe throughput degenerate: $d")
    }
  }

  test("rate-source soak: hybrid two-tower serving sustains the query stream") {
    // per micro-batch: one bucket-pruned lexical probe + one cell-pruned
    // vector probe + the queries×2k RRF fusion — the fused retrieval row;
    // the floor is conservative (two probes per trigger)
    measureWithRetry { i =>
      Soak.hybridRun(spark, corpusDocs = 20000, queriesRate = 500,
        tag = s"spec$i")
    } { d =>
      assert(d.batches >= 2 && d.totalRows > 2000, d)
      assert(d.rowsPerSec > 300, s"hybrid probe throughput degenerate: $d")
    }
  }

  test("rate-source soak: the ingest loop's automatic compaction holds ingest and serving") {
    // the fragmentation watch fires compactDir from the ingest loop's own
    // maintenance slot every few triggers while a serving stream probes
    // the same index; the run REQUIRES >=1 automatic compaction and row
    // integrity — the floors pin both loops staying functional through it
    measureWithRetry { i =>
      Soak.annIngestAutoCompactRun(spark, corpusVecs = 20000,
        vecsRate = 5000, queriesRate = 500, tag = s"spec$i")
    } { case (ingest, serve, compactions) =>
      assert(compactions >= 1L)
      assert(ingest.batches >= 2 && ingest.totalRows > 5000, ingest)
      assert(ingest.rowsPerSec > 1000,
        s"auto-compacting ingest throughput degenerate: $ingest")
      assert(serve.batches >= 1 && serve.rowsPerSec > 100,
        s"serving through auto-compaction degenerate: $serve")
    }
  }

  test("rate-source soak: IVF×PQ composed serving sustains the query stream") {
    // per micro-batch: driver probe-cell choice + distance tables, then a
    // directory-pruned scan of the probed cells' CODES only — both memory
    // levers composed; same conservative floor as the single-lever rows
    measureWithRetry { i =>
      Soak.ivfPqRun(spark, corpusVecs = 20000, queriesRate = 500,
        tag = s"spec$i")
    } { d =>
      assert(d.batches >= 2 && d.totalRows > 2000, d)
      assert(d.rowsPerSec > 300, s"ivf×pq probe throughput degenerate: $d")
    }
  }

  test("rate-source soak: ANN serving sustains through a mid-soak retrain") {
    // the full ops-hardening path: corpus append + refit + staged swap land
    // while the stream serves; the signature re-prepare and the retry-once
    // must hold throughput over the WHOLE soak, swap window included
    measureWithRetry { i =>
      Soak.annRetrainRun(spark, corpusVecs = 20000, queriesRate = 500,
        tag = s"spec$i")
    } { d =>
      assert(d.batches >= 2 && d.totalRows > 2000, d)
      assert(d.rowsPerSec > 300,
        s"ann probe throughput degenerate through retrain: $d")
    }
  }

  test("rate-source soak: ANN serving sustains through a mid-soak compaction") {
    // the maintenance path: six fragmenting appends are rewritten to one
    // file per cell and staged-swapped while the stream serves; no
    // signature changes — the per-trigger listing + retry-once must carry
    // throughput over the swap window (annCompactRun itself REQUIRES the
    // file count to have dropped)
    measureWithRetry { i =>
      Soak.annCompactRun(spark, corpusVecs = 20000, queriesRate = 500,
        tag = s"spec$i")
    } { d =>
      assert(d.batches >= 2 && d.totalRows > 2000, d)
      assert(d.rowsPerSec > 300,
        s"ann probe throughput degenerate through compaction: $d")
    }
  }

  test("rate-source soak: the ingest loop survives a mid-soak crash-restart with no duplicate appends") {
    // the first incarnation is stopped cold halfway, a fresh monitor
    // re-seeds from the persisted state dir and the same checkpoint
    // resumes; annIngestRestartRun itself REQUIRES zero duplicate vec_ids
    // — the assert here pins that ingest also kept flowing on both sides
    // of the crash
    measureWithRetry { i =>
      Soak.annIngestRestartRun(spark, corpusVecs = 20000, vecsRate = 5000,
        tag = s"spec$i")
    } { d =>
      assert(d.batches >= 2 && d.totalRows > 10000, d)
      assert(d.rowsPerSec > 1000,
        s"ingest throughput degenerate through the restart: $d")
    }
  }

  test("rate-source soak: annealed mixture sustains the composition gate") {
    // per micro-batch: tokenize + language token agg (tiny collect) +
    // standing-totals fold + broadcast rates join + md5 gate; budgets sit
    // below supply so the full anneal path runs every batch
    measureWithRetry { _ =>
      Soak.mixtureRun(spark, corpusDocs = 20000, docsRate = 40000)
    } { d =>
      assert(d.batches >= 2 && d.totalRows > 40000, d)
      assert(d.rowsPerSec > 4000, s"mixture throughput degenerate: $d")
    }
  }

  test("rate-source soak: perceptual hash dedup sustains the media firehose") {
    // the full decode → aHash → multi-index Hamming probe chain per
    // micro-batch; floor far below a healthy 4-core rate (CI-noise-proof)
    measureWithRetry { i =>
      Soak.hashDedupRun(spark, corpusItems = 20000, itemsRate = 10000,
        tag = s"spec$i")
    } { d =>
      assert(d.batches >= 2 && d.totalRows > 10000, d)
      assert(d.rowsPerSec > 1000, s"hash dedup throughput degenerate: $d")
    }
  }
}
