package graft

import graft.operators.Sampling

/** Deterministic hash-gate sampling: membership is a pure function of the
  * key (stable under repartition and re-runs), rates land near nominal,
  * and the threshold encoding is exact at binary fractions.
  */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("threshold encoding: exact at binary fractions, monotone") {
    assert(Sampling.thresholdHex(0.25) == "40000000")
    assert(Sampling.thresholdHex(0.5) == "80000000")
    assert(Sampling.thresholdHex(0.0) == "00000000")
    assert(Sampling.thresholdHex(1.0) == "g") // sorts after all hex → keep all
    assert("ffffffff" < "g")
  }

  test("bottom-k-by-hash aggregator: partition-invariant, equals window form") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val sampler = udaf(new graft.functions.Aggregators.BottomKByHash(5))
    val data = (0L until 500L).map(i => (s"g${i % 3}", i.toString)).toDF("g", "v")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"g").agg(sampler($"v").as("s"))
      .select($"g", $"s")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val a = run(data)
    val b = run(data.repartition(13)) // partial-agg merge order changes
    assert(a == b)
    // equals the total-sort window formulation
    val w = Window.partitionBy($"g").orderBy(md5($"v"), $"v")
    val windowed = data.distinct()
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .groupBy($"g").agg(collect_list($"v").as("s")) // window order not kept by collect_list
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(a.view.mapValues(_.toSet).toMap == windowed)
  }

  test("bottom-k buffer: bounded insert/merge equals brute-force trim") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    val agg = new graft.functions.Aggregators.BottomKByHash(4)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 100) {
      val vals = Seq.fill(rnd.nextInt(30))(rnd.nextInt(12).toString)
      val (l, r) = vals.splitAt(if (vals.isEmpty) 0 else rnd.nextInt(vals.length + 1))
      val bufL = l.foldLeft(agg.zero)(agg.reduce)
      val bufR = r.foldLeft(agg.zero)(agg.reduce)
      assert(bufL.length <= 4 && bufR.length <= 4)
      val merged = agg.merge(bufL, bufR)
      assert(merged.length <= 4)
      val expect = vals.distinct.sortBy(v => (md5hex(v), v)).take(4)
      assert(agg.finish(merged) == expect, s"vals=$vals split=${l.length}")
    }
  }

  test("membership is key-pure: identical across runs and partitionings") {
    val ids = (0L until 2000L).toDF("id")
    val a = ids.filter(Sampling.hashGate($"id", 0.3))
      .as[Long].collect().toSet
    val b = ids.repartition(7).filter(Sampling.hashGate($"id", 0.3))
      .as[Long].collect().toSet
    assert(a == b)
    // rate near nominal (md5 uniformity): 0.3 ± 0.05 at n=2000
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05, s"rate ${a.size / 2000.0}")
    // nested fractions: the 10% sample is a subset of the 30% sample
    val c = ids.filter(Sampling.hashGate($"id", 0.1)).as[Long].collect().toSet
    assert(c.subsetOf(a))
  }

  test("corpus mixture: budgets derive rates, clamp keeps all, gate lands near rate") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang",
        size(graft.operators.TextAnalysis.tokens($"text")).cast("long").as("n_tokens"))
    val totals = docs.groupBy($"lang").agg(
      sum($"n_tokens").as("tok"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val mixed = Sampling.corpusMixture(spark, sf)
      .as[(Long, String, Long)].collect()
    val keptByLang = mixed.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    // fr's budget exceeds its tokens -> rate clamps to 1, everything kept
    assert(keptByLang.get("fr").contains(totals("fr")._2),
      s"fr kept ${keptByLang.get("fr")} of ${totals("fr")._2}")
    // en is over budget -> downsampled near rate = budget / tokens
    val enRate = 5000.0 / totals("en")._1
    assert(enRate < 1.0, "fixture must oversupply en for this test")
    val enKept = keptByLang.getOrElse("en", 0L).toDouble / totals("en")._2
    assert(math.abs(enKept - enRate) < 0.15,
      s"en kept fraction $enKept vs rate $enRate")
    // unbudgeted languages keep everything
    (totals.keySet - "en" - "fr").foreach { l =>
      assert(keptByLang.getOrElse(l, 0L) == totals(l)._2, s"lang $l")
    }
    // deterministic across runs
    val again = Sampling.corpusMixture(spark, sf)
      .as[(Long, String, Long)].collect()
    assert(mixed.toSet == again.toSet)
  }

  test("holdout split: disjoint, exhaustive, stable, near-nominal fractions") {
    val ids = (0L until 4000L).toDF("id")
    val split = ids.select($"id",
      Sampling.holdoutSplit($"id", valFrac = 0.1, testFrac = 0.1).as("s"))
      .as[(Long, String)].collect()
    assert(split.length == 4000) // exhaustive: every key lands in one band
    val byS = split.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byS.keySet == Set("train", "val", "test"))
    assert(math.abs(byS("train") / 4000.0 - 0.8) < 0.05)
    assert(math.abs(byS("val") / 4000.0 - 0.1) < 0.03)
    assert(math.abs(byS("test") / 4000.0 - 0.1) < 0.03)
    // growing the corpus never migrates an existing key between splits
    val grown = (0L until 8000L).toDF("id").select($"id",
      Sampling.holdoutSplit($"id", valFrac = 0.1, testFrac = 0.1).as("s"))
      .as[(Long, String)].collect().toMap
    assert(split.forall { case (id, s) => grown(id) == s })
  }

  test("mixture epochs: upsampling repeats docs, realized tokens land near budget") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang",
        size(graft.operators.TextAnalysis.tokens($"text")).cast("long").as("n_tokens"))
    val totals = docs.groupBy($"lang").agg(sum($"n_tokens").as("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budgets = Map("en" -> 5000L, "de" -> 8000L)
    val rows = Sampling.corpusMixtureEpochs(spark, sf, budgets)
      .as[(Long, String, Long, Long)].collect()
    // (doc, epoch) is the output grain — no accidental duplication
    assert(rows.map(r => (r._1, r._4)).distinct.length == rows.length)
    val ratioDe = budgets("de").toDouble / totals("de")
    assert(ratioDe > 1.0, "fixture must undersupply de for this test")
    // de is upsampled: full epochs present beyond 1
    assert(rows.exists(r => r._2 == "de" && r._4 >= 2))
    // realized token mass approximates each budget (gated remainder is
    // only near-exact in expectation)
    Seq("en", "de").foreach { l =>
      val realized = rows.filter(_._2 == l).map(_._3).sum.toDouble
      assert(math.abs(realized / budgets(l) - 1.0) < 0.25,
        s"$l realized $realized vs budget ${budgets(l)}")
    }
    // unbudgeted languages: exactly one epoch, everything kept
    val frRows = rows.filter(_._2 == "fr")
    assert(frRows.forall(_._4 == 1L))
    assert(frRows.length.toLong ==
      docs.filter($"lang" === "fr").count())
  }

  test("SpaceSaving: exact in the no-eviction regime, equals the exact wordcount") {
    import org.apache.spark.sql.functions._
    val exact = graft.operators.TextAnalysis.vocabStats(spark, sf, topK = 1000)
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("n_occurrences")).toMap
    val sketched = graft.operators.TextAnalysis.vocabStatsSketch(spark, sf, topK = 1000)
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("n_occurrences")).toMap
    assert(sketched == exact) // 31 distinct tokens << capacity 256: no eviction anywhere
    // and partition-invariant in this regime
    val sk = udaf(new graft.functions.Aggregators.SpaceSavingTopK(256))
    val repart = graft.sources.Tables.documents(spark, sf).repartition(13)
      .select(explode(graft.operators.TextAnalysis.tokens($"text")).as("token"))
      .agg(sk($"token").as("c"))
      .select(explode($"c").as("c"))
      .select($"c.item", $"c.count")
      .as[(String, Long)].collect().toMap
    assert(repart == exact)
  }

  test("SpaceSaving eviction regime: guaranteed hitters present, error bounds hold") {
    val agg = new graft.functions.Aggregators.SpaceSavingTopK(16)
    // zipf-ish stream: 2 heavy hitters + 300 singletons, interleaved
    val stream = new scala.util.Random(42).shuffle(
      (Seq.fill(1000)("h1") ++ Seq.fill(500)("h2") ++
        (0 until 300).map(i => s"tail$i")).toVector)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong

    // single-summary path: the classic SpaceSaving guarantees
    var buf = agg.zero
    stream.foreach(v => buf = agg.reduce(buf, v))
    val out = agg.finish(buf).map(c => c.item -> c).toMap
    assert(out.size == 16)
    truth.filter(_._2 > n / 16).keys.foreach(h => assert(out.contains(h), s"hitter $h evicted"))
    out.values.foreach { c =>
      val t = truth(c.item)
      assert(c.count >= t, s"${c.item}: ${c.count} underestimates $t")
      assert(c.count - c.err <= t, s"${c.item}: err bound broken")
      assert(c.err <= n / 16, s"${c.item}: err ${c.err} above N/capacity")
    }

    // merged-summaries path: partials over 4 chunks, pairwise merge — the
    // overestimate invariant survives merging and truncation keeps hitters
    val parts = stream.grouped((stream.size + 3) / 4).toSeq.map { chunk =>
      var b = agg.zero
      chunk.foreach(v => b = agg.reduce(b, v))
      b
    }
    val merged = agg.finish(parts.reduce(agg.merge)).map(c => c.item -> c).toMap
    Seq("h1", "h2").foreach { h =>
      assert(merged.contains(h), s"hitter $h lost in merge")
      val c = merged(h)
      assert(c.count >= truth(h) && c.count - c.err <= truth(h), s"$h merged bounds")
    }
  }

  test("shardOf: in-range, deterministic, roughly balanced at 16 shards") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)
    val assigned = docs.select($"doc_id", Sampling.shardOf($"doc_id", 16).as("shard"))
      .as[(Long, Long)].collect().toMap
    assert(assigned.size == docs.count())
    assert(assigned.values.forall(s => s >= 0 && s < 16))
    // repartitioning the input does not move any document (pure key function)
    val again = docs.repartition(7)
      .select($"doc_id", Sampling.shardOf($"doc_id", 16).as("shard"))
      .as[(Long, Long)].collect().toMap
    assert(assigned == again)
    // md5 balance: no shard holds more than 4x its fair share at n=500
    val sizes = assigned.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.values.max <= 4 * 500 / 16)
  }

  test("writeTrainingShards: co-located layout, one file per shard, readable by pruning") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"n_chars")
    Sampling.writeTrainingShards(docs, dir, nShards = 16)
    // exactly one data file per shard directory: the exchange key equals
    // the directory key, so each shard is written by a single task
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty && shardDirs.length <= 16)
    shardDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${d.getName}: ${parts.length} files")
    }
    // membership round-trips: reading back reproduces the direct assignment
    val back = spark.read.parquet(dir)
      .select($"doc_id", $"shard".cast("long").as("shard"))
      .as[(Long, Long)].collect().toMap
    val direct = docs.select($"doc_id", Sampling.shardOf($"doc_id", 16).as("shard"))
      .as[(Long, Long)].collect().toMap
    assert(back == direct)
    // a single-shard read prunes to one directory (partition filter, not scan)
    val one = spark.read.parquet(dir).filter($"shard" === 3)
    val scanned = one.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.partitionCount
    }.sum
    assert(scanned == 1, s"expected 1 pruned partition, scanned $scanned")
  }

  test("trainingOrder: complete, shard-stable across epochs, epoch-reshuffled within shards") {
    import org.apache.spark.sql.functions.{count, countDistinct, lit, max, min}
    val order = Sampling.trainingOrder(spark, sf, nEpochs = 2, nShards = 8).persist()
    try {
      val nDocs = graft.sources.Tables.documents(spark, sf).count()
      assert(order.count() == 2 * nDocs) // every doc appears once per epoch
      // positions within each (epoch, shard) are a contiguous 1..n run
      val badRuns = order.groupBy($"epoch", $"shard")
        .agg(min($"pos").as("lo"), max($"pos").as("hi"),
          count(lit(1)).as("n"))
        .filter($"lo" =!= 1L || $"hi" =!= $"n").count()
      assert(badRuns == 0)
      // shard membership is epoch-independent...
      val shardsPerDoc = order.groupBy($"doc_id")
        .agg(countDistinct($"shard").as("s")).filter($"s" =!= 1L).count()
      assert(shardsPerDoc == 0)
      // ...but the within-shard order differs between epochs (the reshuffle)
      val e0 = order.filter($"epoch" === 0L)
        .select($"shard", $"pos", $"doc_id".as("d0"))
      val e1 = order.filter($"epoch" === 1L)
        .select($"shard", $"pos", $"doc_id".as("d1"))
      val moved = e0.join(e1, Seq("shard", "pos"))
        .filter($"d0" =!= $"d1").count()
      assert(moved > 0, "epoch reshuffle had no effect")
      // deterministic: a repartitioned re-run yields the identical order
      val again = Sampling.trainingOrder(spark, sf, nEpochs = 2, nShards = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val first = order.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(first == again)
    } finally order.unpersist()
  }

  test("sourceCappedCorpus: per-source cap, salted rank equals the plain window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val cap = 10
    val got = Sampling.sourceCappedCorpus(spark, sf, cap = cap)
    val rows = got.collect()
    val perSource = rows.groupBy(_.getAs[String]("source"))
    assert(perSource.values.forall(_.length <= cap))
    perSource.values.foreach { g =>
      assert(g.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to g.length).toSeq)
    }
    // the salted two-phase rank must select the SAME rows as the single
    // naive window (the salt is an execution detail, not a semantic)
    val stats = graft.operators.TextAnalysis
      .textStatsOf(graft.sources.Tables.documents(spark, sf), carry = Seq("source"))
      .select($"doc_id", $"source", $"quality_score")
    val naive = stats
      .withColumn("rk", row_number().over(Window.partitionBy($"source")
        .orderBy($"quality_score".desc, $"doc_id")).cast("long"))
      .filter($"rk" <= cap)
      .as[(Long, String, Double, Long)].collect().toSet
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
      r.getLong(3))).toSet == naive)
    assert(rows.nonEmpty)
  }

  test("mixtureTemperature: weights normalize; alpha=1 is natural; alpha<1 lifts the tail") {
    val t = Sampling.mixtureTemperature(spark, sf, alpha = 0.7).collect()
    assert(t.nonEmpty)
    val wsum = t.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    // alpha = 1 → weight == natural share (within the r6 rounding)
    Sampling.mixtureTemperature(spark, sf, alpha = 1.0).collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("weight") - r.getAs[Double]("share")) <= 2e-6, r.toString)
    }
    // alpha < 1 flattens: the smallest-share language gains weight, the
    // largest loses — the lift that temperature sampling exists to provide
    val byShare = t.sortBy(_.getAs[Double]("share"))
    assert(byShare.head.getAs[Double]("weight") > byShare.head.getAs[Double]("share"))
    assert(byShare.last.getAs[Double]("weight") < byShare.last.getAs[Double]("share"))
    // targets track the budget (round-off only)
    val tsum = t.map(_.getAs[Long]("target_tokens")).sum
    assert(math.abs(tsum - 100000L) <= t.length, s"targets sum to $tsum")
  }

  test("weightedSample: equals the driver-side A-ES brute force; heavy rows dominate") {
    import org.apache.spark.sql.functions._
    // brute-force A-ES over the fixture with the same md5-derived uniforms
    def lnUMicros(docId: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val units = java.lang.Long.parseLong(hex, 16)
      math.round(math.log((units + 1).toDouble / 4294967296.0) * 1e6)
    }
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id",
        size(graft.operators.TextAnalysis.tokens($"text")).cast("long").as("w"))
      .as[(Long, Long)].collect()
    val expected = docs.filter(_._2 > 0)
      .map { case (id, w) => (id, w, lnUMicros(id)) }
      .sortBy { case (id, w, lm) => (-(lm.toDouble / w), id) }
      .take(100).zipWithIndex
      .map { case ((id, w, lm), i) => (i + 1, id, w, lm) }.toSeq
    val got = Sampling.weightedSample(spark, sf)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // determinism under repartitioning (TakeOrdered is partition-invariant)
    val reparted = Sampling.weightedSampleOf(
      graft.sources.Tables.documents(spark, sf).repartition(17),
      size(graft.operators.TextAnalysis.tokens($"text")).cast("long"), 100)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(reparted == got)
    // weighting works: with weights 100 vs 1 split half/half, the heavy
    // class dominates the top-50 (deterministic under the fixed hash)
    val synth = spark.range(1000L)
      .select($"id".as("doc_id"), when($"id" % 2 === 0, 100L).otherwise(1L).as("w"))
    val top = Sampling.weightedSampleOf(synth, $"w", 50)
      .filter($"weight" === 100L).count()
    assert(top >= 45, s"heavy rows in top-50: $top")
    // zero-weight rows can never be sampled
    val withZero = spark.range(10L)
      .select($"id".as("doc_id"), when($"id" < 5, 0L).otherwise(7L).as("w"))
    val ids = Sampling.weightedSampleOf(withZero, $"w", 10)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids == (5L until 10L).toSet)
  }

  test("curriculumOrder: nested epoch slices, quality anneal, full final epoch") {
    val got = Sampling.curriculumOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byEpoch = got.groupBy(_._1).map { case (e, rows) =>
      e -> rows.map(t => (t._4, t._5)).toSet }
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    val n = graft.sources.Tables.documents(spark, sf).count()
    // the final epoch is the whole corpus; slices are nested and at least
    // nominal-sized (value-level cutoffs include ties)
    assert(byEpoch(2L).size == n)
    assert(byEpoch(0L).subsetOf(byEpoch(1L)) && byEpoch(1L).subsetOf(byEpoch(2L)))
    (0 to 2).foreach { e =>
      assert(byEpoch(e.toLong).size >= (n * (e + 1) + 2) / 3, s"epoch $e size")
    }
    // the anneal: each epoch's worst admitted quality only decreases
    val worst = (0 to 2).map(e => byEpoch(e.toLong).map(_._2).min)
    assert(worst(0) >= worst(1) && worst(1) >= worst(2))
    assert(worst(0) > worst(2)) // epoch 0 is actually selective on the fixture
    // within an (epoch, shard) slice, positions are 1..k with no gaps
    got.groupBy(t => (t._1, t._2)).foreach { case ((e, sh), rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"epoch $e shard $sh positions")
    }
  }

  test("trainingManifest: every curriculum doc packed exactly once per epoch, tokens conserved") {
    // (epoch, shard, pack_id, pos, doc_id, n_tokens, start_tok, pack_off)
    val manifest = Sampling.trainingManifest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    val curriculum = Sampling.curriculumOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3))) // (epoch, doc_id)
    // exactly-once-per-epoch conservation: the manifest's (epoch, doc)
    // multiset IS the curriculum's — nothing dropped, nothing duplicated
    val mDocs = manifest.map(t => (t._1, t._5))
    assert(mDocs.length == mDocs.distinct.length, "a doc packed twice in an epoch")
    assert(mDocs.toSet == curriculum.toSet,
      "manifest (epoch, doc) set differs from the curriculum selection")
    manifest.groupBy(t => (t._1, t._2)).foreach { case ((e, sh), rows) =>
      val ordered = rows.sortBy(_._4)
      // spans tile the shard stream: each doc starts where the previous
      // ended (start_tok is the running token count), so pack spans never
      // overlap and never leave holes
      val starts = ordered.map(_._7)
      val expected = ordered.map(_._6).scanLeft(0L)(_ + _).init
      assert(starts.toSeq == expected.toSeq, s"epoch $e shard $sh spans")
      // pack arithmetic is exactly div/mod of the running count
      ordered.foreach { t =>
        assert(t._3 == Math.floorDiv(t._7, 256L) && t._8 == t._7 % 256L,
          s"epoch $e shard $sh pack arithmetic")
      }
    }
  }
}
