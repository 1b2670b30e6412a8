package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Morton interleave: known codes, round-trip bit structure, and the
  * layout property the curve exists for — range partitions on zval are
  * small rectangles in (x, y), so min/max stats prune on BOTH dims.
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def z(x: Long, y: Long): Long =
    Seq((x, y)).toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y")).as[Long].head()

  test("known Morton codes") {
    // reference interleave: x on even bits, y on odd
    assert(z(0, 0) == 0L)
    assert(z(1, 0) == 1L)
    assert(z(0, 1) == 2L)
    assert(z(1, 1) == 3L)
    assert(z(2, 0) == 4L)
    assert(z(3, 3) == 15L)
    assert(z(0xFFFF, 0) == 0x55555555L)
    assert(z(0, 0xFFFF) == 0xAAAAAAAAL)
    assert(z(0xFFFF, 0xFFFF) == 0xFFFFFFFFL)
  }

  test("interleave matches a bit-by-bit reference across random inputs") {
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(64)((rnd.nextInt(0x10000).toLong, rnd.nextInt(0x10000).toLong))
    val got = pts.toDF("x", "y").select(ZOrder.zValue($"x", $"y")).as[Long].collect()
    assert(got.toSeq == pts.map { case (x, y) => ref(x, y) })
  }

  test("Z-ordered write: per-file bounding boxes are compact on BOTH dims") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val n = 1 << 12
    val rnd = new scala.util.Random(42)
    val df = Seq.fill(n)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    ZOrder.writeZOrdered(df, "x", "y", dir, numFiles = 16)
    val withFile = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
    val boxes = withFile.groupBy($"f")
      .agg(min($"x").as("x0"), max($"x").as("x1"),
        min($"y").as("y0"), max($"y").as("y1"), count(lit(1)).as("n"))
      .collect()
    assert(boxes.length >= 8, s"only ${boxes.length} files")
    // a random (unclustered) split would give each file a ~full-extent box
    // on both dims (~1023); Z-range files must average far below that on
    // the combined area — the pruning-effectiveness property
    val meanArea = boxes.map { r =>
      (r.getLong(2) - r.getLong(1) + 1).toDouble *
        (r.getLong(4) - r.getLong(3) + 1).toDouble
    }.sum / boxes.length
    val fullArea = 1024.0 * 1024.0
    assert(meanArea < fullArea / 3.0,
      s"mean per-file area $meanArea vs full $fullArea — layout not clustering")
  }

  test("zone map: boxes cover every row; pruned scan is row-equal to the full filter and skips files") {
    val dir = graft.operators.ZOrder.ensureZonedLineitem(spark, sf)
    val zones = spark.read.parquet(s"$dir/zones")
    val table = spark.read.parquet(s"$dir/table")
    // coverage: zone row counts tile the table exactly
    assert(zones.agg(sum($"n_rows")).as[Long].head() == table.count())
    // parity: the skipping probe returns exactly the full-scan filter rows
    val pruned = ZOrder.zonemapPrunedScan(spark, sf).collect().map(_.toSeq)
    val full = table
      .filter($"l_partkey".between(20, 60) && $"l_suppkey".between(2, 8))
      .collect().map(_.toSeq)
    assert(pruned.sortBy(_.toString).toSeq == full.sortBy(_.toString).toSeq)
    assert(pruned.nonEmpty)
    // skipping: the predicate box overlaps a strict subset of the files
    val total = zones.count()
    val read = zones.filter($"min_x" <= 60 && $"max_x" >= 20 &&
      $"min_y" <= 8 && $"max_y" >= 2).count()
    assert(read < total, s"no skipping: read $read of $total files")
    // a box outside every zone resolves from the zone map alone: empty
    // result, right schema, no scan built over the layout
    val none = ZOrder.prunedRangeScan(spark, s"$dir/table", zones,
      "l_partkey", "l_suppkey", -100L, -1L, -100L, -1L)
    assert(none.count() == 0L)
    assert(none.schema == table.schema)
  }

  test("zoned append extends the zone map incrementally: coverage holds, probes see appended rows, old boxes untouched") {
    val n = 1 << 11
    val rnd = new scala.util.Random(7)
    val all = Seq.fill(n)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val (base, rest) = all.splitAt(n / 2)
    val (app1, app2) = rest.splitAt(rest.length / 2)
    val dir = java.nio.file.Files.createTempDirectory("zm_append").toString
    ZOrder.writeZOrdered(base.toDF("x", "y"), "x", "y", s"$dir/table",
      numFiles = 8)
    ZOrder.buildZoneMap(spark, s"$dir/table", "x", "y")
      .write.mode("overwrite").parquet(s"$dir/zones")
    val zonesBefore = spark.read.parquet(s"$dir/zones").collect()
      .map(_.toSeq).toSet
    ZOrder.appendZoned(app1.toDF("x", "y"), "x", "y", dir)
    ZOrder.appendZoned(app2.toDF("x", "y"), "x", "y", dir)
    val zones = spark.read.parquet(s"$dir/zones")
    // coverage: zone rows tile the enlarged table exactly, and the
    // original files' boxes ride through untouched
    assert(zones.agg(sum($"n_rows")).head.getLong(0) == n.toLong)
    assert(zonesBefore.subsetOf(zones.collect().map(_.toSeq).toSet),
      "append must not rewrite existing zone rows")
    // probe parity over a box that hits base AND appended rows
    val got = ZOrder.prunedRangeScan(spark, s"$dir/table", zones,
      "x", "y", 0L, 200L, 0L, 200L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = all.filter { case (x, y) => x <= 200 && y <= 200 }
      .sorted
    assert(got == want, s"${got.length} vs ${want.length} rows")
  }

  test("coverage check: unmapped files (torn append) are read; duplicated zone rows read once; stale zone rows drop") {
    val n = 1 << 10
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(n)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val extra = Seq.fill(64)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val dir = java.nio.file.Files.createTempDirectory("zm_torn").toString
    ZOrder.writeZOrdered(base.toDF("x", "y"), "x", "y", s"$dir/table",
      numFiles = 8)
    ZOrder.buildZoneMap(spark, s"$dir/table", "x", "y")
      .write.mode("overwrite").parquet(s"$dir/zones")
    // TORN append: data files land, the zone append never runs (the crash
    // window between appendZoned's two writes)
    extra.toDF("x", "y").coalesce(1).write.mode("append")
      .parquet(s"$dir/table")
    def probe() = ZOrder.prunedRangeScan(spark, s"$dir/table",
      spark.read.parquet(s"$dir/zones"), "x", "y", 0L, 1023L, 0L, 1023L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(probe() == (base ++ extra).sorted,
      "rows in unmapped files were lost to the skip")
    // DUPLICATED zone rows (a concurrent-append race double-writing the
    // map): every file still reads exactly once
    spark.read.parquet(s"$dir/zones").write.mode("append")
      .parquet(s"$dir/zones")
    assert(probe() == (base ++ extra).sorted,
      "duplicated zone rows duplicated data rows")
    // STALE zone rows (files rewritten from under the map): rows come back
    // from the unmapped rewrite output, stale pointers drop silently
    val stats = graft.util.Compaction.compactDir(spark, dir, "table")
    assert(stats.filesAfter < stats.filesBefore)
    assert(probe() == (base ++ extra).sorted,
      "a raw compactDir on a zoned layout lost rows")
  }

  test("tagged zoned append: a replayed batch re-publishes rows AND zone rows exactly once") {
    val rnd = new scala.util.Random(13)
    val base = Seq.fill(256)((rnd.nextInt(512).toLong, rnd.nextInt(512).toLong))
    val batch = Seq.fill(128)((rnd.nextInt(512).toLong, rnd.nextInt(512).toLong))
    val dir = java.nio.file.Files.createTempDirectory("zm_tagged").toString
    ZOrder.writeZOrdered(base.toDF("x", "y"), "x", "y", s"$dir/table",
      numFiles = 4)
    ZOrder.buildZoneMap(spark, s"$dir/table", "x", "y")
      .write.mode("overwrite").parquet(s"$dir/zones")
    val tag = graft.util.BatchAppend.tag(7L)
    ZOrder.appendZoned(batch.toDF("x", "y"), "x", "y", dir, numFiles = 2,
      batchTag = Some(tag))
    val rows1 = spark.read.parquet(s"$dir/table").count()
    val zones1 = spark.read.parquet(s"$dir/zones").count()
    // the at-least-once replay: same tag, same batch content
    ZOrder.appendZoned(batch.toDF("x", "y"), "x", "y", dir, numFiles = 2,
      batchTag = Some(tag))
    assert(spark.read.parquet(s"$dir/table").count() == rows1,
      "replayed tagged append duplicated data rows")
    assert(spark.read.parquet(s"$dir/zones").count() == zones1,
      "replayed tagged append duplicated zone rows")
    // coverage after the replay: zones tile the table exactly, probe exact
    val zones = spark.read.parquet(s"$dir/zones")
    assert(zones.agg(sum($"n_rows")).head.getLong(0) == rows1)
    val got = ZOrder.prunedRangeScan(spark, s"$dir/table", zones,
      "x", "y", 0L, 511L, 0L, 511L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == (base ++ batch).sorted)
  }

  test("compactZoned: rewrite + fresh map swap as one unit — skipping restored, above-fence batch carried") {
    val rnd = new scala.util.Random(17)
    val base = Seq.fill(1 << 10)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val dir = java.nio.file.Files.createTempDirectory("zm_compact").toString
    ZOrder.writeZOrdered(base.toDF("x", "y"), "x", "y", s"$dir/table",
      numFiles = 4)
    ZOrder.buildZoneMap(spark, s"$dir/table", "x", "y")
      .write.mode("overwrite").parquet(s"$dir/zones")
    // fragment with tagged ingest batches 0..5
    val appended = (0 to 5).map { b =>
      val rows = Seq.fill(64)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      ZOrder.appendZoned(rows.toDF("x", "y"), "x", "y", dir, numFiles = 2,
        batchTag = Some(graft.util.BatchAppend.tag(b.toLong)))
      rows
    }
    val all = base ++ appended.flatten
    // batch 5 is still replayable: fence at 4 must carry its files verbatim
    val stats = ZOrder.compactZoned(spark, dir, "x", "y",
      targetBytes = 1L << 20, safeBatchFence = Some(4L))
    assert(stats.filesAfter < stats.filesBefore, stats.toString)
    assert(stats.carriedFiles > 0L, "fence carried nothing")
    val tag5 = graft.util.BatchAppend.tag(5L)
    val fs = new org.apache.hadoop.fs.Path(s"$dir/table")
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/table"))
      .exists(_.getPath.getName.startsWith(s"$tag5-")),
      "replayable batch 5's files were compacted away")
    // the fresh map covers everything (carried files included): exact rows
    val zones = spark.read.parquet(s"$dir/zones")
    assert(zones.agg(sum($"n_rows")).head.getLong(0) == all.length.toLong)
    val got = ZOrder.prunedRangeScan(spark, s"$dir/table", zones,
      "x", "y", 0L, 1023L, 0L, 1023L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == all.sorted)
    // and skipping works again post-swap: a small box reads < all files
    val live = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/table"))
      .count(st => st.isFile && !st.getPath.getName.startsWith("_"))
    val read = zones.filter($"min_x" <= 60L && $"max_x" >= 20L &&
      $"min_y" <= 60L && $"max_y" >= 20L).count()
    assert(read < live, s"no skipping post-compaction: $read of $live")
  }

  test("zone map on the Z-order layout skips files a linear sort-by-x layout cannot (y-only predicate)") {
    // the claim Z-order exists for: a predicate on the SECOND dimension
    // alone prunes Z-range files (each covers a small y-band too) but no
    // linear-sorted file (every x-range file spans ~the full y extent)
    val n = 1 << 12
    val rnd = new scala.util.Random(42)
    val df = Seq.fill(n)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val zdir = java.nio.file.Files.createTempDirectory("zm_z").toString
    val ldir = java.nio.file.Files.createTempDirectory("zm_lin").toString
    ZOrder.writeZOrdered(df, "x", "y", zdir, numFiles = 16)
    df.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(ldir)
    def overlapFrac(dir: String): Double = {
      val zones = ZOrder.buildZoneMap(spark, dir, "x", "y")
      val total = zones.count()
      // y-only box: y in [0, 127], x unconstrained
      val read = zones.filter($"min_y" <= 127L && $"max_y" >= 0L).count()
      read.toDouble / total
    }
    val zFrac = overlapFrac(zdir)
    val linFrac = overlapFrac(ldir)
    assert(linFrac > 0.9, s"linear layout unexpectedly prunable: $linFrac")
    assert(zFrac < 0.5, s"Z layout not pruning on y: $zFrac")
    // and the pruned read over the Z layout returns the exact filter rows
    val got = ZOrder.prunedRangeScan(spark, zdir,
      ZOrder.buildZoneMap(spark, zdir, "x", "y"),
      "x", "y", 0L, 1023L, 0L, 127L).collect().map(_.toSeq)
    val want = df.filter($"y" <= 127L).collect().map(_.toSeq)
    assert(got.sortBy(_.toString).toSeq == want.sortBy(_.toString).toSeq)
  }
}
