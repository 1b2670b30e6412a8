package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for LLM-training-data pipelines (builder-brief north
  * star): image/audio/video carried as opaque `binary` payloads with typed
  * metadata, processed by batched per-partition operators.
  *
  * The Spark-side plumbing — schema, partitioning, operator signatures,
  * batch shape — is real and tested. The codec itself is a clearly-marked
  * DETERMINISTIC FAKE ([[FakeCodec]]): the container has no image/audio
  * libraries, and the engine design question is the dataflow, not the
  * pixels. Swapping in a real decoder changes one object.
  *
  * Scale notes:
  *  - Payloads ride the DataFrame as `BinaryType` — they stay columnar in
  *    Parquet, split across executors by the scan, and never pass through
  *    the driver.
  *  - Decode/feature-extract runs via `mapPartitions` over micro-batches of
  *    `batchSize` rows — the JVM analogue of `mapInPandas`: per-batch setup
  *    cost (a real codec would init once per batch/partition) is amortized,
  *    memory is bounded by batch × payload size, and the operator emits one
  *    typed row per input row with no shuffle.
  *  - Frame sampling explodes videos into frame rows BEFORE feature
  *    extraction, so a long video parallelizes across the cluster instead
  *    of pinning one task.
  */
object Media {

  /** Typed metadata traveling next to the opaque payload. */
  final case class MediaMeta(
      mediaType: String, // "image" | "audio" | "video"
      width: Int,
      height: Int,
      sampleRateHz: Int,
      durationMs: Long,
      codec: String)

  final case class MediaRow(
      media_id: Long,
      doc_id: Long,
      meta: MediaMeta,
      payload: Array[Byte])

  final case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      mean_luma: Double,
      luma_histogram: Array[Long]) // 8 buckets

  final case class AudioFeatures(
      media_id: Long,
      sample_rate_hz: Int,
      n_samples: Int,
      mean_amplitude: Double, // of |signed 8-bit PCM|, exact multiple of 1/n
      zero_crossings: Long)

  /** One sampled video frame: typed row the frame-explode stage emits. */
  final case class FrameRow(
      media_id: Long,
      frame_idx: Int,
      offset_ms: Long,
      frame: Array[Byte])

  final case class VideoFrameFeatures(
      media_id: Long,
      frame_idx: Int,
      offset_ms: Long,
      mean_luma: Double) // exact multiple of 1/frameBytes — double-exact

  /** DETERMINISTIC FAKE codec — stands in for libjpeg/ffmpeg/etc., which are
    * not in this container. Every function is a pure, seeded transform of
    * the payload bytes so specs can assert exact values; the signatures are
    * the ones a real codec adapter would implement.
    */
  object FakeCodec {
    /** "Decode" a payload to width×height luma bytes (row-major). */
    def decodeLuma(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
      val out = new Array[Byte](width * height)
      var i = 0
      while (i < out.length) {
        out(i) = payload(i % payload.length)
        i += 1
      }
      out
    }

    /** Nearest-neighbor "resize" of a luma plane. */
    def resizeLuma(luma: Array[Byte], w: Int, h: Int, w2: Int, h2: Int): Array[Byte] = {
      val out = new Array[Byte](w2 * h2)
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) {
          out(y * w2 + x) = luma((y * h / h2) * w + (x * w / w2))
          x += 1
        }
        y += 1
      }
      out
    }

    /** "Decode" a payload to signed 8-bit PCM samples. */
    def decodePcm(payload: Array[Byte]): Array[Byte] = payload

    /** "Extract" the bytes of one video frame from the payload. */
    def frameAt(payload: Array[Byte], frameIdx: Int, frameBytes: Int): Array[Byte] = {
      val out = new Array[Byte](frameBytes)
      var i = 0
      while (i < frameBytes) {
        out(i) = payload((frameIdx * frameBytes + i) % payload.length)
        i += 1
      }
      out
    }
  }

  /** Deterministic synthetic media table: opaque payload seeded by media_id.
    * Generated distributed (spark.range), never on the driver.
    */
  def synthesize(spark: SparkSession, n: Int, payloadBytes: Int = 256,
      mediaType: String = "image"): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val rnd = new scala.util.Random(id) // seeded → reproducible
      val payload = new Array[Byte](payloadBytes)
      rnd.nextBytes(payload)
      MediaRow(id, id % 100,
        MediaMeta(mediaType, width = 16, height = 16,
          sampleRateHz = if (mediaType == "audio") 16000 else 0,
          durationMs = if (mediaType == "video") 4000L else 0L,
          codec = "fake"),
        payload)
    }
  }

  /** Decode + feature-extract, batched per partition (mapInPandas shape):
    * rows are consumed in groups of `batchSize`; each batch "opens the
    * codec" once, then emits one feature row per media row.
    */
  def imageFeatures(media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real adapter would init the native codec here, once per batch
        batch.iterator.map { r =>
          val luma = FakeCodec.decodeLuma(r.payload, r.meta.width, r.meta.height)
          val hist = new Array[Long](8)
          var sum = 0L
          luma.foreach { b =>
            val v = b & 0xff
            sum += v
            hist(v >> 5) += 1
          }
          ImageFeatures(r.media_id, r.meta.width, r.meta.height,
            sum.toDouble / luma.length, hist)
        }
      }
    }
  }

  /** Audio decode + feature-extract, same batched per-partition shape as
    * [[imageFeatures]] (one codec init per batch): signed 8-bit PCM →
    * mean |amplitude| and zero-crossing count per clip. */
  def audioFeatures(media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val pcm = FakeCodec.decodePcm(r.payload)
          var absSum = 0L
          var crossings = 0L
          var i = 0
          while (i < pcm.length) {
            absSum += math.abs(pcm(i).toInt)
            if (i > 0 && pcm(i - 1) * pcm(i) < 0) crossings += 1
            i += 1
          }
          AudioFeatures(r.media_id, r.meta.sampleRateHz, pcm.length,
            absSum.toDouble / pcm.length, crossings)
        }
      }
    }
  }

  /** Registered companion of [[audioFeatureRollup]] ({OUT}-oracle input):
    * per-clip decoded audio features. The mean is engine-safe double: each
    * value is an exact multiple of 1/n_samples with magnitude ≤ 128. */
  def audioFeatureDump(spark: SparkSession, sfDir: String): DataFrame =
    audioFeatures(synthesize(spark, n = 2000, mediaType = "audio")).toDF()

  /** Registered query: the audio twin of [[imageFeatureRollup]] — decode +
    * per-clip features + a relational rollup by amplitude bucket
    * (floor(mean/8): exact in double, both engines). Oracle: DuckDB
    * re-aggregates the Spark-dumped per-clip features. */
  def audioFeatureRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    audioFeatures(synthesize(spark, n = 2000, mediaType = "audio")).toDF()
      .withColumn("amp_bucket", floor($"mean_amplitude" / 8).cast("long"))
      .groupBy($"amp_bucket")
      .agg(
        count(lit(1)).as("n_clips"),
        round(avg($"mean_amplitude") + 1e-9, 4).as("avg_amplitude"),
        sum($"zero_crossings").as("total_crossings"))
      .orderBy($"amp_bucket")
  }

  /** Resize as a standalone stage: emits resized luma payloads with updated
    * metadata — unchanged rows stream through, no shuffle. */
  def resize(media: Dataset[MediaRow], w2: Int, h2: Int,
      batchSize: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val luma = FakeCodec.decodeLuma(r.payload, r.meta.width, r.meta.height)
          val out = FakeCodec.resizeLuma(luma, r.meta.width, r.meta.height, w2, h2)
          r.copy(meta = r.meta.copy(width = w2, height = h2), payload = out)
        }
      }
    }
  }

  /** Registered companion of [[imageFeatureRollup]]: the per-image decoded
    * features themselves. Rows-only on its own (the seeded fake codec has
    * no DuckDB twin), it exists so the media_image_features ORACLE can
    * re-aggregate these Spark-computed features in DuckDB (the `{OUT}`
    * mechanism, same shape as `simhash_signatures`) — an independent check
    * of the rollup stage over the decode output. The avg is engine-safe
    * without integer tricks: each mean_luma is an exact multiple of
    * 1/(width·height) with a partial-sum magnitude far below 2^53/256, so
    * double summation is exact in ANY order on both engines. */
  def imageFeatureDump(spark: SparkSession, sfDir: String): DataFrame =
    imageFeatures(synthesize(spark, n = 2000)).toDF()
      // comma-joined string, not array<long>: the driver's pandas comparer
      // cannot sort list columns; the consuming oracle re-splits it
      .withColumn("luma_histogram",
        org.apache.spark.sql.functions.expr(
          "array_join(transform(luma_histogram, x -> cast(x AS string)), ',')"))

  /** Registered query: synthesize a deterministic media table, run the
    * batched decode + feature extraction, and roll the features up per
    * (width, height) — pins the full multimodal dataflow (binary payloads →
    * mapPartitions batches → typed features → relational agg) under the
    * correctness dump and the bench. Oracle: DuckDB aggregates the
    * Spark-dumped per-image features ([[imageFeatureDump]]). */
  def imageFeatureRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val feats = imageFeatures(synthesize(spark, n = 2000))
    feats
      .groupBy($"width", $"height")
      .agg(
        count(lit(1)).as("n_images"),
        round(avg($"mean_luma") + 1e-9, 4).as("avg_luma"),
        sum(element_at($"luma_histogram", 1)).as("bucket0_total"))
      .orderBy($"width", $"height")
  }

  /** One 64-bit perceptual hash per image ([[imageAHash]]). */
  final case class ImageHash(media_id: Long, ahash: Long)

  /** Deterministic media table WITH planted near-duplicates: the first
    * `nBase` items are seeded-random; each of the next `nBase` is a
    * re-encode-with-noise VARIANT of its base (1 + id%3 payload bytes
    * XOR-flipped at deterministic positions) — the re-encode/watermark/
    * noise drift perceptual dedup exists to catch, which EXACT payload
    * hashing misses by construction. Works for all three modalities (the
    * meta block follows [[synthesize]]'s per-type conventions). */
  def synthesizeVariants(spark: SparkSession, nBase: Int,
      mediaType: String = "image", payloadBytes: Int = 256): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(2L * nBase).map { id =>
      val baseId: Long = if (id < nBase) id.toLong else id - nBase
      val rnd = new scala.util.Random(baseId) // variant shares its base's payload
      val payload = new Array[Byte](payloadBytes)
      rnd.nextBytes(payload)
      if (id >= nBase) {
        val edits = 1 + (id % 3).toInt
        var e = 0
        while (e < edits) {
          val pos = ((id * 31 + e * 97) % payloadBytes).toInt
          payload(pos) = (payload(pos) ^ 0x5a).toByte
          e += 1
        }
      }
      MediaRow(id, id % 100,
        MediaMeta(mediaType, width = 16, height = 16,
          sampleRateHz = if (mediaType == "audio") 16000 else 0,
          durationMs = if (mediaType == "video") 4000L else 0L,
          codec = "fake"),
        payload)
    }
  }

  /** Image-typed [[synthesizeVariants]] (kept as the image entries' name). */
  def synthesizeImageVariants(spark: SparkSession, nBase: Int,
      payloadBytes: Int = 256): Dataset[MediaRow] =
    synthesizeVariants(spark, nBase, "image", payloadBytes)

  /** Perceptual hash (aHash) per image: decode → 8×8 nearest-neighbor
    * downsample → per-pixel mean threshold → 64-bit hash. All INTEGER
    * arithmetic — bit i is set iff 64·pixel_i > Σpixels, so there is no
    * float mean to drift between engines or platforms. Same batched
    * mapPartitions shape as every media op (one codec init per batch). */
  def imageAHash(media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val luma = FakeCodec.decodeLuma(r.payload, r.meta.width, r.meta.height)
          val small = FakeCodec.resizeLuma(luma, r.meta.width, r.meta.height, 8, 8)
          var sum = 0L
          var i = 0
          while (i < 64) { sum += (small(i) & 0xff); i += 1 }
          var h = 0L
          i = 0
          while (i < 64) {
            if (64L * (small(i) & 0xff) > sum) h |= (1L << i)
            i += 1
          }
          ImageHash(r.media_id, h)
        }
      }
    }
  }

  /** Registered companion of [[imagePhashNearDup]]: the per-image aHash
    * signatures (rows-only — the fake codec has no DuckDB twin; the dump
    * IS the oracle input, the `simhash_signatures` pattern): DuckDB
    * brute-forces the Hamming pairs over these Spark-computed hashes. */
  def imagePhashDump(spark: SparkSession, sfDir: String): DataFrame =
    imageAHash(synthesizeImageVariants(spark, nBase = 100)).toDF()

  /** Registered query: perceptual near-duplicate IMAGES — the multimodal
    * dedup tier: decode → aHash → multi-index Hamming self-join
    * ([[graft.operators.Dedup.hammingNearDup]], 8×8-bit chunks for the
    * d ≤ 6 budget) → exact bit_count verify. Exact payload hashing cannot
    * see these pairs (every variant differs in raw bytes); the perceptual
    * tier is to images what SimHash is to text, and shares its candidate
    * machinery. */
  def imagePhashNearDup(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Dedup.hammingNearDup(
      imageAHash(synthesizeImageVariants(spark, nBase = 100)).toDF(),
      "media_id", "ahash", numChunks = 8, maxHamming = 6)
      .withColumnRenamed("a_id", "a_media_id")
      .withColumnRenamed("b_id", "b_media_id")

  /** Registered query: INCREMENTAL perceptual image dedup — a batch of
    * arriving images (media_id ≥ 150: the variants of bases 50-99) probes
    * a PERSISTED hash index over the standing corpus (media_id < 150),
    * built once per process ([[graft.operators.Dedup.writeHashIndex]],
    * bucketed by (chunk, key) so the probe reads the index co-located —
    * zero index-side exchange, only the batch moves). The image-firehose
    * shape: day-over-day ingestion dedups against everything already
    * accepted without ever re-pairing the corpus with itself. Oracle:
    * DuckDB brute-forces batch×corpus Hamming from the image_phash_dump
    * signatures.
    */
  def incrementalPhashNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Dedup
    val sigs = imageAHash(synthesizeImageVariants(spark, nBase = 100)).toDF()
    val table = "graft_phash_index"
    if (!spark.catalog.tableExists(table))
      Dedup.writeHashIndex(sigs.filter($"media_id" < 150), "media_id",
        "ahash", table, numChunks = 8,
        location = Some(
          s"${graft.util.TmpDirs.perProcessDir("graft_phashidx")}/img"))
    Dedup.hammingIndexProbe(table, sigs.filter($"media_id" >= 150),
      "media_id", "ahash", numChunks = 8, maxHamming = 6)
      .withColumnRenamed("new_id", "new_media_id")
      .withColumnRenamed("dup_of_id", "dup_of_media_id")
      .orderBy($"new_media_id", $"dup_of_media_id")
  }

  /** One 64-bit audio fingerprint per clip ([[audioFingerprint]]). */
  final case class AudioHash(media_id: Long, afp: Long)

  /** 64-band energy fingerprint per clip (the Haitsma–Kalker robust-hash
    * shape): signed 8-bit PCM split into 64 equal-share windows; bit w is
    * set iff window w's mean |amplitude| exceeds the clip mean — INTEGER
    * cross-multiplied (energy_w · n > total · len_w), so there is no float
    * mean to drift. Re-encode noise moves few windows across their
    * threshold; unrelated clips land at Hamming ≈ 32. */
  def audioFingerprint(media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[AudioHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val pcm = FakeCodec.decodePcm(r.payload)
          val n = pcm.length
          var total = 0L
          var i = 0
          while (i < n) { total += math.abs(pcm(i).toInt); i += 1 }
          var h = 0L
          var w = 0
          while (w < 64) {
            val lo = w * n / 64
            val hi = (w + 1) * n / 64
            var e = 0L
            var j = lo
            while (j < hi) { e += math.abs(pcm(j).toInt); j += 1 }
            if (e * n > total * (hi - lo)) h |= (1L << w)
            w += 1
          }
          AudioHash(r.media_id, h)
        }
      }
    }
  }

  /** Registered companion of [[audioFpNearDup]] (rows-only — it IS the
    * oracle input): DuckDB brute-forces the Hamming pairs over these
    * Spark-computed fingerprints. */
  def audioFpDump(spark: SparkSession, sfDir: String): DataFrame =
    audioFingerprint(synthesizeVariants(spark, nBase = 100, "audio")).toDF()

  /** Registered query: perceptual near-duplicate AUDIO — the audio leg of
    * the multimodal dedup tier, sharing [[graft.operators.Dedup.hammingNearDup]]
    * (8×8-bit chunks, d ≤ 6) with the image and text tiers. */
  def audioFpNearDup(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Dedup.hammingNearDup(
      audioFingerprint(synthesizeVariants(spark, nBase = 100, "audio")).toDF(),
      "media_id", "afp", numChunks = 8, maxHamming = 6)
      .withColumnRenamed("a_id", "a_media_id")
      .withColumnRenamed("b_id", "b_media_id")

  /** One 64-bit temporal video hash ([[videoTHash]]). */
  final case class VideoHash(media_id: Long, vhash: Long)

  /** Temporal video hash: `nFrames` uniformly indexed frames × an 8-bit
    * per-frame luma-histogram signature — bit (f·8 + j) is set iff frame
    * f's histogram bucket j exceeds the uniform share (8·hist_j >
    * frameBytes, exact integers). Captures the luma-distribution ARC over
    * time, so a re-encoded copy collides while a reshuffled or unrelated
    * video does not. */
  def videoTHash(media: Dataset[MediaRow], nFrames: Int = 8,
      batchSize: Int = 64): Dataset[VideoHash] = {
    import media.sparkSession.implicits._
    require(nFrames * 8 == 64, s"nFrames $nFrames must fill the 64-bit hash")
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val frameBytes = r.meta.width * r.meta.height
          var h = 0L
          var f = 0
          while (f < nFrames) {
            val frame = FakeCodec.frameAt(r.payload, f, frameBytes)
            val hist = new Array[Int](8)
            var i = 0
            while (i < frame.length) { hist((frame(i) & 0xff) >> 5) += 1; i += 1 }
            var j = 0
            while (j < 8) {
              if (8 * hist(j) > frame.length) h |= (1L << (f * 8 + j))
              j += 1
            }
            f += 1
          }
          VideoHash(r.media_id, h)
        }
      }
    }
  }

  /** Registered companion of [[videoTHashNearDup]] (rows-only — it IS the
    * oracle input). The variant payload is nFrames·frameBytes so every
    * sampled frame carries distinct content. */
  def videoTHashDump(spark: SparkSession, sfDir: String): DataFrame =
    videoTHash(synthesizeVariants(spark, nBase = 100, "video",
      payloadBytes = 2048)).toDF()

  /** Registered query: perceptual near-duplicate VIDEO — the video leg of
    * the multimodal dedup tier over the temporal hash, same shared
    * multi-index Hamming core (8×8-bit chunks, d ≤ 6). */
  def videoTHashNearDup(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Dedup.hammingNearDup(
      videoTHash(synthesizeVariants(spark, nBase = 100, "video",
        payloadBytes = 2048)).toDF(),
      "media_id", "vhash", numChunks = 8, maxHamming = 6)
      .withColumnRenamed("a_id", "a_media_id")
      .withColumnRenamed("b_id", "b_media_id")

  /** Sample every `everyMs` milliseconds of a video into frame rows —
    * the explode happens BEFORE decode so frames parallelize downstream. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long,
      frameBytes: Int = 64): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.mediaType == "video")
      .flatMap { r =>
        val n = math.max(1L, r.meta.durationMs / everyMs).toInt
        (0 until n).iterator.map { f =>
          FrameRow(r.media_id, f, f * everyMs,
            FakeCodec.frameAt(r.payload, f, frameBytes))
        }
      }
  }

  /** Per-frame decode + feature extraction — same batched per-partition
    * shape as [[imageFeatures]]. Runs AFTER the frame explode, so a long
    * video's frames are spread across tasks instead of pinning one. The
    * mean is an exact multiple of 1/frame.length with magnitude ≤ 255, so
    * it is bit-identical in any engine and any evaluation order. */
  def videoFrameFeatures(frames: Dataset[FrameRow],
      batchSize: Int = 64): Dataset[VideoFrameFeatures] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real adapter would init the native codec here, once per batch
        batch.iterator.map { r =>
          var sum = 0L
          r.frame.foreach(b => sum += (b & 0xff))
          VideoFrameFeatures(r.media_id, r.frame_idx, r.offset_ms,
            sum.toDouble / r.frame.length)
        }
      }
    }
  }

  /** Registered companion of [[videoFeatureRollup]] ({OUT}-oracle input):
    * per-frame decoded features of the sampled synthetic videos. No array
    * or binary columns — comparer-safe by construction. */
  def videoFeatureDump(spark: SparkSession, sfDir: String): DataFrame =
    videoFrameFeatures(
      sampleFrames(synthesize(spark, n = 500, mediaType = "video"),
        everyMs = 250)).toDF()

  /** Registered query: the video leg of the multimodal triad — frame
    * sampling (explode-before-decode), batched per-frame decode, then a
    * per-video rollup with a scene-cut count from an event-ordered window
    * (`lag` over frame_idx). One Exchange on media_id serves both the
    * window and the final aggregate. Oracle: DuckDB replays the window +
    * rollup from the per-frame dump.
    *
    * Determinism: every mean_luma is an exact multiple of 1/64 with
    * magnitude ≤ 255 — sums, differences, and the >16.0 comparison are all
    * exact in double on both engines; avg is rounded with the +1e-9
    * half-way nudge like every rounded ratio in this repo. */
  def videoFeatureRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val feats = videoFrameFeatures(
      sampleFrames(synthesize(spark, n = 500, mediaType = "video"),
        everyMs = 250)).toDF()
    val w = Window.partitionBy($"media_id").orderBy($"frame_idx")
    feats
      .withColumn("prev_luma", lag($"mean_luma", 1).over(w))
      .groupBy($"media_id")
      .agg(
        count(lit(1)).as("n_frames"),
        round(avg($"mean_luma") + 1e-9, 4).as("avg_luma"),
        sum(when($"prev_luma".isNotNull &&
          abs($"mean_luma" - $"prev_luma") > 16.0, 1L).otherwise(0L))
          .as("n_scene_cuts"))
      .orderBy($"media_id")
  }

  /** The cross-modal (image, caption) PAIR fixture — LAION-style rows
    * where a training sample is the PAIR, not either modality alone, so
    * dedup must consider both: dropping on image alone would collapse the
    * same photo under different captions (distinct supervision signals);
    * dropping on caption alone would collapse stock phrases over distinct
    * images. 200 deterministic pairs over the [[synthesizeImageVariants]]
    * image set and 12-token synthetic captions (a caption VARIANT swaps
    * the last word: 3-gram Jaccard 9/11 ≈ 0.82, well over the 0.5 gate;
    * different caption families share zero grams):
    *
    *  - pairs 0–99: base image b with caption family b (the corpus);
    *  - pairs 100–139 (b = p−100 < 40): image VARIANT of b + caption
    *    VARIANT of b → duplicate pair, the only true cross-modal dups;
    *  - pairs 140–169 (b ∈ [40,70)): image variant of b + pair (b+1)'s
    *    EXACT caption → image-dup/caption-distinct, kept (and an
    *    identical-caption edge against pair b+1 whose image differs);
    *  - pairs 170–199 (b ∈ [70,100)): caption variant of b + pair
    *    ((b+1) mod 100)'s EXACT image → caption-dup/image-distinct, kept
    *    (pair 199 reuses pair 0's image id byte-identically — the
    *    same-underlying-asset case arrives as a Hamming-0 edge).
    *
    * One row per pair: (pair_id, media_id, ahash, caption) — the aHash
    * computed per referenced image through the standard decode path. This
    * dump IS the oracle input ([[imagePhashDump]] contract): the fake
    * codec has no DuckDB twin, but everything DOWNSTREAM of the signatures
    * — both edge relations and the pair-level conjunction — replays. */
  def crossModalPairSigs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def baseCap(k: Long) = (0 until 12).map(j => s"c${k}w$j").mkString(" ")
    def varCap(k: Long) =
      ((0 until 11).map(j => s"c${k}w$j") :+ s"c${k}vx").mkString(" ")
    val pairs = (0L until 200L).map { p =>
      if (p < 100) (p, p, baseCap(p))
      else {
        val b = p - 100
        if (b < 40) (p, p, varCap(b))
        else if (b < 70) (p, p, baseCap(b + 1))
        else (p, (b + 1) % 100, varCap(b))
      }
    }.toDF("pair_id", "media_id", "caption")
    val sigs = imageAHash(synthesizeImageVariants(spark, nBase = 100)).toDF()
    pairs.join(sigs, "media_id")
      .select($"pair_id", $"media_id", $"ahash", $"caption")
      .orderBy($"pair_id")
  }

  /** Registered query: CROSS-MODAL pair dedup — a pair duplicates another
    * iff BOTH its image is a perceptual near-dup (Hamming ≤ 6 over aHash,
    * the multi-index pigeonhole join of [[imagePhashNearDup]]) AND its
    * caption is a text near-dup (3-gram Jaccard ≥ 0.5, the prefix-filtered
    * exact verify of [[graft.operators.Dedup.tokenJaccardPairsOf]]). The
    * conjunction is one equi-join of the two edge sets on the ordered
    * (a, b) pair key — both relations emit a_id < b_id, so agreement is
    * co-partitioned and no pair-level cartesian ever forms. Identity cases
    * need no special path: byte-identical images meet at Hamming 0,
    * identical captions at Jaccard 1.
    *
    * Scale: each edge set is a linear near-dup output (banded/pigeonholed,
    * never all-pairs); the conjunction join keys on pair ids. MediaSpec
    * pins the quadrants: image-dup/caption-distinct and
    * caption-dup/image-distinct pairs appear in exactly one edge relation
    * and never in the output. Fully hash-checked from the
    * `crossmodal_pair_sigs` dump (Hamming brute-force + gram Jaccard +
    * conjunction all replay in DuckDB). */
  def crossModalDupPairs(spark: SparkSession, sfDir: String,
      maxHamming: Int = 6, threshold: Double = 0.5): DataFrame = {
    import spark.implicits._
    val pairs = crossModalPairSigs(spark, sfDir)
    val imgEdges = graft.operators.Dedup.hammingNearDup(
      pairs.select($"pair_id", $"ahash"), "pair_id", "ahash",
      numChunks = 8, maxHamming = maxHamming)
    val capEdges = graft.operators.Dedup.tokenJaccardPairsOf(
      pairs.select($"pair_id".as("doc_id"), $"caption".as("text")),
      n = 3, threshold = threshold)
    imgEdges.join(capEdges,
        imgEdges("a_id") === capEdges("a_doc_id") &&
          imgEdges("b_id") === capEdges("b_doc_id"))
      .select($"a_id".as("a_pair_id"), $"b_id".as("b_pair_id"),
        $"hamming", $"jaccard")
      .orderBy($"a_pair_id", $"b_pair_id")
  }
}
