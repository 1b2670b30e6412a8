package graft

import java.nio.file.Files

import graft.multimodal.Media

/** Multimodal plumbing: binary columns through Parquet, batched decode
  * shape, deterministic features, resize metadata, frame explosion.
  */
class MediaSpec extends SparkTestBase {
  import spark.implicits._

  test("binary payload + typed metadata round-trips through Parquet") {
    val dir = Files.createTempDirectory("media").toString + "/t"
    val media = Media.synthesize(spark, 50)
    media.write.parquet(dir)
    val back = spark.read.parquet(dir).as[Media.MediaRow]
    assert(back.count() == 50)
    val (orig, rt) = (media.filter(_.media_id == 7L).head(),
      back.filter(_.media_id == 7L).head())
    assert(orig.payload.toSeq == rt.payload.toSeq)
    assert(orig.meta == rt.meta)
    // schema: payload is a real BinaryType column, meta a nested struct
    assert(back.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
  }

  test("imageFeatures: deterministic, one row per media row, bounded stats") {
    val feats = Media.imageFeatures(Media.synthesize(spark, 100), batchSize = 16)
      .collect().sortBy(_.media_id)
    assert(feats.length == 100)
    feats.foreach { f =>
      assert(f.mean_luma >= 0 && f.mean_luma <= 255)
      assert(f.luma_histogram.sum == f.width * f.height)
    }
    // determinism: second run bit-identical
    val again = Media.imageFeatures(Media.synthesize(spark, 100), batchSize = 16)
      .collect().sortBy(_.media_id)
    assert(feats.map(_.mean_luma).toSeq == again.map(_.mean_luma).toSeq)
    // batch size must not change results, only batch shape
    val bigBatch = Media.imageFeatures(Media.synthesize(spark, 100), batchSize = 1000)
      .collect().sortBy(_.media_id)
    assert(feats.map(_.mean_luma).toSeq == bigBatch.map(_.mean_luma).toSeq)
  }

  test("resize updates metadata and payload dimensions") {
    val resized = Media.resize(Media.synthesize(spark, 10), 4, 4).collect()
    assert(resized.length == 10)
    resized.foreach { r =>
      assert(r.meta.width == 4 && r.meta.height == 4)
      assert(r.payload.length == 16)
    }
  }

  test("sampleFrames explodes videos into parallelizable frame rows") {
    val videos = Media.synthesize(spark, 6, mediaType = "video") // 4000 ms each
    val frames = Media.sampleFrames(videos, everyMs = 1000)
    assert(frames.count() == 24) // 6 videos × 4 frames
    val one = frames.filter($"media_id" === 2L)
      .select($"frame_idx", $"offset_ms").as[(Int, Long)].collect().sorted
    assert(one.toSeq == Seq((0, 0L), (1, 1000L), (2, 2000L), (3, 3000L)))
    // images produce no frames
    assert(Media.sampleFrames(Media.synthesize(spark, 5), 1000).count() == 0)
  }

  test("videoFrameFeatures + rollup: deterministic, exact means, correct scene cuts") {
    // crafted 2-frame video: frame 0 all 0x10 (mean 16), frame 1 all 0x40
    // (mean 64) → one scene cut at |64-16| = 48 > 16
    val crafted = Seq(Media.MediaRow(0L, 0L,
      Media.MediaMeta("video", 0, 0, 0, 2000L, "fake"),
      Array.fill[Byte](8)(0x10) ++ Array.fill[Byte](8)(0x40))).toDS()
    val frames = Media.sampleFrames(crafted, everyMs = 1000, frameBytes = 8)
    val feats = Media.videoFrameFeatures(frames).collect().sortBy(_.frame_idx)
    assert(feats.map(_.mean_luma).toSeq == Seq(16.0, 64.0))

    // synthetic path: one feature row per frame, means exact multiples of
    // 1/64 in [0,255], invariant to batch size and partitioning
    val vids = Media.synthesize(spark, 20, mediaType = "video")
    val f1 = Media.videoFrameFeatures(Media.sampleFrames(vids, 250), batchSize = 7)
      .collect().map(f => (f.media_id, f.frame_idx) -> f.mean_luma).toMap
    assert(f1.size == 20 * 16)
    f1.values.foreach { m =>
      assert(m >= 0 && m <= 255)
      assert(m * 64 == math.rint(m * 64)) // exact multiple of 1/64
    }
    val f2 = Media.videoFrameFeatures(
      Media.sampleFrames(vids.repartition(5), 250), batchSize = 1000)
      .collect().map(f => (f.media_id, f.frame_idx) -> f.mean_luma).toMap
    assert(f1 == f2)

    // rollup: registered entry shape — one row per video, n_frames = 16,
    // scene cuts match a hand-rolled recount from the frame features
    val roll = graft.multimodal.Media.videoFeatureRollup(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(roll.size == 500)
    assert(roll.values.forall(_._1 == 16L))
    val dump = Media.videoFeatureDump(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    val recount = dump.groupBy(_._1).map { case (id, fs) =>
      val byIdx = fs.sortBy(_._2).map(_._3).toSeq
      id -> byIdx.sliding(2).count {
        case Seq(a, b) => math.abs(b - a) > 16.0
        case _         => false
      }.toLong
    }
    assert(roll.map { case (id, (_, cuts)) => id -> cuts } == recount)
  }

  test("audioFeatures: crafted PCM gives exact amplitude and crossings; deterministic") {
    val crafted = Seq(Media.MediaRow(0L, 0L,
      Media.MediaMeta("audio", 0, 0, 16000, 0L, "fake"),
      Array[Byte](4, -4, 4, -4, 0, 2, 2, -2))).toDS()
    val f = Media.audioFeatures(crafted).collect().head
    assert(f.n_samples == 8)
    // |4|·4 + 0 + |2|·3 = 22 over 8 samples
    assert(f.mean_amplitude == 22.0 / 8)
    // sign products < 0 at (4,-4) ×3 and (2,-2); the 0 sample kills its pairs
    assert(f.zero_crossings == 4L)
    val a = Media.audioFeatures(Media.synthesize(spark, 100, mediaType = "audio"))
      .collect().map(r => r.media_id -> (r.mean_amplitude, r.zero_crossings)).toMap
    val b = Media.audioFeatures(
      Media.synthesize(spark, 100, mediaType = "audio").repartition(7))
      .collect().map(r => r.media_id -> (r.mean_amplitude, r.zero_crossings)).toMap
    assert(a == b)
    assert(a.size == 100)
    a.values.foreach { case (amp, _) => assert(amp >= 0 && amp <= 128) }
  }

  test("imagePhashNearDup equals brute-force Hamming; planted variants found") {
    val pairs = Media.imagePhashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = Media.imageAHash(Media.synthesizeImageVariants(spark, 100))
      .collect().map(h => h.media_id -> h.ahash).toMap
    assert(sigs.size == 200)
    val brute = (for {
      x <- sigs.keys; y <- sigs.keys if x < y
      d = java.lang.Long.bitCount(sigs(x) ^ sigs(y)) if d <= 6
    } yield (x, y, d)).toSet
    // the multi-index join is EXACT within the pigeonhole budget
    assert(pairs == brute)
    // planted re-encode variants: a single payload-byte edit has a 1/4
    // chance of landing on a downsampled pixel, so many variants hash
    // IDENTICALLY and nearly all land within the budget; unrelated images
    // sit at Hamming ≈ 32 — require a clear majority found and zero
    // cross-family pairs
    val found = (100L until 200L).count(v =>
      pairs.exists(p => p._1 == v - 100 && p._2 == v))
    assert(found >= 90, s"only $found/100 planted variants found")
    pairs.foreach { case (x, y, _) =>
      assert(y == x + 100, s"cross-family pair ($x,$y)")
    }
  }

  test("audioFpNearDup equals brute-force Hamming; planted variants found") {
    val pairs = Media.audioFpNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = Media.audioFingerprint(
      Media.synthesizeVariants(spark, 100, "audio"))
      .collect().map(h => h.media_id -> h.afp).toMap
    val brute = (for {
      x <- sigs.keys; y <- sigs.keys if x < y
      d = java.lang.Long.bitCount(sigs(x) ^ sigs(y)) if d <= 6
    } yield (x, y, d)).toSet
    assert(pairs == brute)
    val found = (100L until 200L).count(v =>
      pairs.exists(p => p._1 == v - 100 && p._2 == v))
    assert(found >= 90, s"only $found/100 planted variants found")
    pairs.foreach { case (x, y, _) =>
      assert(y == x + 100, s"cross-family pair ($x,$y)")
    }
  }

  test("videoTHashNearDup equals brute-force Hamming; planted variants found") {
    val pairs = Media.videoTHashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = Media.videoTHash(
      Media.synthesizeVariants(spark, 100, "video", payloadBytes = 2048))
      .collect().map(h => h.media_id -> h.vhash).toMap
    val brute = (for {
      x <- sigs.keys; y <- sigs.keys if x < y
      d = java.lang.Long.bitCount(sigs(x) ^ sigs(y)) if d <= 6
    } yield (x, y, d)).toSet
    assert(pairs == brute)
    val found = (100L until 200L).count(v =>
      pairs.exists(p => p._1 == v - 100 && p._2 == v))
    assert(found >= 90, s"only $found/100 planted variants found")
    pairs.foreach { case (x, y, _) =>
      assert(y == x + 100, s"cross-family pair ($x,$y)")
    }
  }

  test("incrementalPhashNearDup: batch probes the standing index, equals brute force") {
    val got = Media.incrementalPhashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = Media.imageAHash(Media.synthesizeImageVariants(spark, 100))
      .collect().map(h => h.media_id -> h.ahash).toMap
    val brute = (for {
      a <- sigs.keys if a < 150
      b <- sigs.keys if b >= 150
      d = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if d <= 6
    } yield (b, a, d)).toSet
    assert(got == brute)
    // the batch is the variants of bases 50-99: every pair is (v, v-100)
    assert(got.nonEmpty)
    got.foreach { case (v, base, _) => assert(base == v - 100) }
  }

  test("hammingNearDup rejects a budget beyond the pigeonhole guarantee") {
    import spark.implicits._
    val sigs = Seq((1L, 0L), (2L, 1L)).toDF("id", "sig")
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.hammingNearDup(sigs, "id", "sig",
        numChunks = 4, maxHamming = 4)
    }
  }

  test("crossModalDupPairs: only image-AND-caption dups; each single-modality quadrant resolves to keep") {
    import spark.implicits._
    val pairs = Media.crossModalPairSigs(spark, sf)
    val dups = Media.crossModalDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exactly the both-modality variants: pair b ~ pair b+100 for b < 40
    assert(dups == (0L until 40L).map(b => (b, b + 100L)).toSet)
    val imgEdges = graft.operators.Dedup.hammingNearDup(
      pairs.select($"pair_id", $"ahash"), "pair_id", "ahash", 8, 6)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val capEdges = graft.operators.Dedup.tokenJaccardPairsOf(
      pairs.select($"pair_id".as("doc_id"), $"caption".as("text")))
      .select($"a_doc_id", $"b_doc_id").as[(Long, Long)].collect().toSet
    // image-dup/caption-distinct (variants of bases 40-69): in the image
    // relation, NOT in the output — same photo, different supervision
    (40L until 70L).foreach { b =>
      assert(imgEdges.contains((b, b + 100L)), s"image edge $b")
      assert(!capEdges.contains((b, b + 100L)), s"caption edge $b")
      assert(!dups.contains((b, b + 100L)), s"kept pair $b")
    }
    // caption-dup/image-distinct (variants of bases 70-99): in the caption
    // relation, NOT in the output — stock phrase over different images
    (70L until 100L).foreach { b =>
      assert(capEdges.contains((b, b + 100L)), s"caption edge $b")
      assert(!imgEdges.contains((b, b + 100L)), s"image edge $b")
      assert(!dups.contains((b, b + 100L)), s"kept pair $b")
    }
    // the byte-identical-image case (pair 199 reuses pair 0's image):
    // Hamming-0 edge, captions distinct, pair kept
    assert(imgEdges.contains((0L, 199L)))
    assert(!dups.contains((0L, 199L)))
  }
}
