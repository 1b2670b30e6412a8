package graft

import graft.operators.TextAnalysis

/** Text-analysis operators (builder-brief north star): tokenization edges,
  * BPE-ish counting, stats invariants, language-ID on crafted text.
  */
class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("tokens: whitespace runs, trim, empty and null safety") {
    val df = Seq((1L, "a  b\tc"), (2L, "  "), (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.tokens($"text").as("t"))
    val m = df.as[(Long, Seq[String])].collect().toMap
    assert(m(1L) == Seq("a", "b", "c"))
    assert(m(2L) == Seq.empty)
    assert(m(3L) == Seq.empty)
    assert(m(4L) == Seq.empty)
  }

  test("BPE-ish token count: letter runs, digit runs, single symbols") {
    val df = Seq(("ab12, cd!", 5), ("hello", 1), ("", 0), ("a1b", 3))
      .toDF("text", "want")
      .select(TextAnalysis.bpeTokenCount($"text").as("got"), $"want")
    df.as[(Int, Int)].collect().foreach { case (got, want) =>
      assert(got == want)
    }
  }

  test("textStats invariants over the fixture") {
    val rows = TextAnalysis.textStats(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val len = r.getAs[Long]("len_chars")
      val q = r.getAs[Double]("quality_score")
      assert(q >= 0.0 && q <= 1.0)
      assert(r.getAs[Long]("n_tokens") <= len || len == 0)
      assert(r.getAs[Double]("stopword_ratio") <= 1.0)
    }
  }

  test("langId picks the language whose markers dominate") {
    // langId runs over the documents table; crafted-text behavior is pinned
    // through the same column expressions via a temp substitution
    val crafted = Seq(
      (1L, "le chat et la souris sont de retour"),
      (2L, "the cat and the mouse of the house"),
      (3L, "el gato y los perros de la casa es grande"))
      .toDF("doc_id", "text")
    crafted.createOrReplaceTempView("crafted_docs")
    val toks = TextAnalysis.tokens($"text")
    import org.apache.spark.sql.functions._
    val guesses = TextAnalysis.langId(spark, sf) // exercises the real query
    assert(guesses.count() == 500)
    // crafted determinism: French markers beat English/Spanish on doc 1, etc.
    val m = crafted.select($"doc_id",
      size(filter(toks, w => w.isin("the", "a", "of", "and", "to", "is", "in"))).as("en"),
      size(filter(toks, w => w.isin("le", "la", "les", "de", "et", "un", "est"))).as("fr"),
      size(filter(toks, w => w.isin("el", "los", "las", "de", "y", "un", "es"))).as("es"))
      .as[(Long, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m(1L)._2 > m(1L)._1 && m(1L)._2 > m(1L)._3) // fr dominates
    assert(m(2L)._1 > m(2L)._2) // en dominates
    assert(m(3L)._3 > m(3L)._1) // es dominates
  }

  test("fingerprint: equal for equal content, stable width, null-safe") {
    val df = Seq((1L, "abcdefghijklmnop"), (2L, "abcdefghijklmnop"),
      (3L, "completely different"), (4L, "short"), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(spark, sf).collect() // real query runs
    assert(fps.length == 500)
    val m = df.select($"doc_id",
      org.apache.spark.sql.functions.array_min(
        org.apache.spark.sql.functions.transform(
          graft.operators.Dedup.charShingles($"text", 8),
          s => org.apache.spark.sql.functions.md5(s.cast("binary")))).as("fp"))
      .as[(Long, Option[String])].collect().toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
    assert(m(1L).get.length == 32) // md5 hex
    assert(m(4L).isEmpty) // shorter than shingle length
    assert(m(5L).isEmpty)
  }

  test("repetitionStats: crafted documents hit exact known fractions") {
    val docs = Seq(
      // 4 lines, "dup dup" twice: dup_line_frac = (4-3)/4 = 0.25;
      // chars: "dup dup"(7)*2 + "a b c"(5) + "x y"(3) = 22, repeated
      // occurrences contribute 7 → 7/22; bigrams of the WHOLE text
      // (newlines are token separators): "dup dup" appears twice among
      // "dup dup","dup a","a b","b c","c dup","dup dup","dup x","x y" →
      // top 2 of 8
      (1L, "dup dup\na b c\ndup dup\nx y"),
      // no repetition anywhere: all fractions 0 (one line, distinct bigrams)
      (2L, "all distinct words here"),
      // blank/null: all fractions 0
      (3L, ""),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val m = docs.select($"doc_id",
      graft.functions.TextExpressions
        .repetitionStats(org.apache.spark.sql.functions.coalesce($"text",
          org.apache.spark.sql.functions.lit("")), 2).as("rs"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(m(1L) == Seq(0.25, 7.0 / 22, 2.0 / 8))
    assert(m(2L) == Seq(0.0, 0.0, 1.0 / 3)) // 3 distinct bigrams, top = 1
    assert(m(3L) == Seq(0.0, 0.0, 0.0))
    assert(m(4L) == Seq(0.0, 0.0, 0.0))
    // and the registered entry emits bounded, rounded columns per doc
    val rows = TextAnalysis.repetitionStats(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      Seq("dup_line_frac", "dup_line_char_frac", "top_bigram_frac").foreach {
        c => val v = r.getAs[Double](c); assert(v >= 0.0 && v <= 1.0, s"$c=$v")
      }
    }
  }

  test("vocabStats: descending top-K, doc_freq <= n_occurrences <= total") {
    val rows = TextAnalysis.vocabStats(spark, sf, topK = 20).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val counts = rows.map(_.getAs[Long]("n_occurrences")).toSeq
    assert(counts == counts.sorted.reverse, "not descending by count")
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    rows.foreach { r =>
      val df_ = r.getAs[Long]("doc_freq")
      assert(df_ >= 1 && df_ <= r.getAs[Long]("n_occurrences"))
      assert(df_ <= nDocs)
    }
    // partition-invariance: the top-K cut is deterministic, so a different
    // input split yields the identical result set
    val again = TextAnalysis.vocabStats(spark, sf, topK = 20).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("ngramDocFreq: reported grams genuinely occur in >= minDocs documents") {
    import org.apache.spark.sql.functions._
    val got = TextAnalysis.ngramDocFreq(spark, sf).collect()
      .map(r => r.getAs[String]("gram") -> r.getAs[Long]("doc_freq")).toMap
    assert(got.nonEmpty, "fixture plants exact dups; shared 8-grams must exist")
    assert(got.values.forall(_ >= 2))
    // independent recount through the un-aggregated explode
    val recount = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id",
        explode(graft.operators.Decontamination.tokenNgrams($"text", 8)).as("gram"))
      .groupBy($"gram").count()
      .collect().map(r => r.getAs[String]("gram") -> r.getAs[Long]("count")).toMap
    got.foreach { case (g, df_) => assert(recount(g) == df_, s"gram $g") }
  }

  test("tfidfTopTerms: per-doc rank contract and terms drawn from the doc") {
    val rows = TextAnalysis.tfidfTopTerms(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token"),
        r.getAs[Double]("score"), r.getAs[Long]("rk")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val byRk = rs.sortBy(_._4)
      assert(byRk.map(_._4).toSeq == (1L to byRk.length).toSeq, s"doc $doc ranks")
      assert(byRk.length <= 3)
      // scores non-increasing in rank
      assert(byRk.map(_._3).toSeq == byRk.map(_._3).sortBy(-_).toSeq, s"doc $doc order")
    }
    // every reported term actually tokenizes out of its document
    val toks = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", TextAnalysis.tokens($"text").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    rows.foreach { case (doc, term, _, _) =>
      assert(toks(doc).contains(term), s"doc $doc term $term")
    }
  }

  test("docChunks: chunks tile the token stream exactly") {
    val chunks = TextAnalysis.docChunks(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("n_chunk_tokens"), r.getAs[String]("chunk_md5")))
    val nTok = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", TextAnalysis.tokens($"text").as("t"))
      .as[(Long, Seq[String])].collect().toMap.view.mapValues(_.length.toLong).toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val byId = cs.sortBy(_._2)
      assert(byId.map(_._2).toSeq == (0L until byId.length).toSeq, s"doc $doc ids")
      assert(byId.map(_._3).sum == nTok(doc), s"doc $doc token sum")
      // all chunks full except possibly the last, which is non-empty
      byId.init.foreach(c => assert(c._3 == 64L, s"doc $doc chunk ${c._2}"))
      assert(byId.last._3 >= 1 && byId.last._3 <= 64)
      assert(byId.forall(_._4.length == 32)) // md5 hex
    }
    // empty docs contribute nothing
    val empties = nTok.filter(_._2 == 0L).keySet
    assert(chunks.forall(c => !empties.contains(c._1)))
  }

  test("bpePairCounts: within-word multiplicity, equals driver-side recount") {
    val got = TextAnalysis.bpePairCounts(spark, sf, topK = 1000).collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Long]("n"))
    assert(got.nonEmpty)
    // independent recount from the raw tokens, keeping multiplicities
    val words = graft.sources.Tables.documents(spark, sf)
      .select(TextAnalysis.tokens($"text").as("t"))
      .as[Seq[String]].collect().flatten
    val expected = words.filter(_.length >= 2)
      .flatMap(w => w.sliding(2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.toMap == expected) // topK=1000 >> distinct pairs of a 31-word vocab
    // descending, deterministic order
    val ns = got.map(_._2).toSeq
    assert(ns == ns.sorted.reverse)
  }

  test("tokenRarityScore equals the driver-side exact computation") {
    val toks = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", TextAnalysis.tokens($"text").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    val vocab = toks.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val total = toks.values.map(_.size.toLong).sum
    val got = TextAnalysis.tokenRarityScore(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("mean_token_freq"))).toList
    assert(got.nonEmpty && got.size == toks.count(_._2.nonEmpty))
    got.foreach { case (id, n, score) =>
      assert(n == toks(id).size.toLong)
      val exact = toks(id).map(vocab).sum.toDouble / (n * total) + 1e-9
      assert(math.abs(score - BigDecimal(exact)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12,
        s"doc $id")
      assert(score > 0.0 && score <= 1.0 + 1e-9)
    }
  }

  test("packedSequences: token-conserving, contiguous per-shard packs, bounded fill") {
    val packs = TextAnalysis.packedSequences(spark, sf).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pack_id"),
        r.getAs[Long]("n_chunks"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))
    assert(packs.nonEmpty)
    // conservation: pack tokens sum to the corpus token total
    val totalTok = graft.sources.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.size(TextAnalysis.tokens($"text"))))
      .as[Long].head()
    assert(packs.map(_._5).sum == totalTok)
    packs.groupBy(_._1).foreach { case (shard, ps) =>
      val ids = ps.map(_._2).sorted.toSeq
      assert(ids == (0L until ps.length).toSeq, s"shard $shard pack ids $ids")
      ps.foreach { p =>
        assert(p._3 >= 1 && p._4 >= 1 && p._4 <= p._3)
        // a chunk (<= 64 tokens) that crosses a 256 boundary stays whole in
        // its pack, so a pack never exceeds contextLen + chunkSize - 1
        assert(p._5 <= 256L + 63L, s"shard $shard pack ${p._2}: ${p._5} tokens")
      }
    }
  }

  test("qualityCalibration: per-source z-scores have mean 0, std 1, monotone in score") {
    val rows = TextAnalysis.qualityCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (src, g) =>
      val zs = g.map(_._4)
      val mean = zs.sum / zs.length
      val std = math.sqrt(zs.map(z => (z - mean) * (z - mean)).sum / zs.length)
      assert(math.abs(mean) < 1e-3, s"$src z-mean $mean")
      assert(math.abs(std - 1.0) < 1e-2, s"$src z-std $std")
      // z order matches score order within a source
      val byScore = g.sortBy(r => (r._3, r._1))
      assert(byScore.map(_._4).zip(byScore.map(_._4).tail)
        .forall { case (a, b) => a <= b + 1e-9 })
    }
  }

  test("sourceNgramDiversity: bounded ratio, distinct never exceeds total") {
    val rows = TextAnalysis.sourceNgramDiversity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, total, distinct, div) =>
      assert(distinct <= total, s"$src: $distinct > $total")
      assert(div > 0.0 && div <= 1.0, s"$src diversity $div")
      assert(math.abs(div - distinct.toDouble / total) < 1e-6)
    }
  }

  test("packingEfficiency agrees with the packedSequences rollup") {
    val eff = TextAnalysis.packingEfficiency(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toMap
    val packs = TextAnalysis.packedSequences(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    val expect = packs.groupBy(_._1).map { case (shard, ps) =>
      val toks = ps.map(_._2).sum
      shard -> (ps.length.toLong, toks,
        BigDecimal(toks.toDouble / (ps.length * 256.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        ps.count(_._2 > 256L).toLong)
    }
    assert(eff == expect)
    // fill is a ratio in (0, overflow bound]
    eff.values.foreach { case (_, _, fill, _) =>
      assert(fill > 0.0 && fill < 1.25, s"fill $fill")
    }
  }

  test("langConfusion: shares sum to 1 per label, doc count conserved, guesses closed") {
    val rows = TextAnalysis.langConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("en", "fr", "es")(r._2))) // guess codomain
    rows.groupBy(_._1).foreach { case (lang, g) =>
      val share = g.map(_._4).sum
      assert(math.abs(share - 1.0) < 1e-4, s"$lang shares sum $share")
    }
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_._3).sum == total)
    // the matrix agrees with a per-doc join of langId against the labels
    val joined = TextAnalysis.langId(spark, sf).select($"doc_id", $"lang_guess")
      .join(graft.sources.Tables.documents(spark, sf).select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang", $"lang_guess").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap == joined)
  }

  test("tokenizerFertility: ≥1 by construction, sums agree with textStats") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.tokenizerFertility(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, words, bpe, fert) =>
      // every whitespace word contains ≥1 captured run, so bpe ≥ words
      assert(bpe >= words, s"$lang bpe $bpe < words $words")
      assert(fert >= 1.0, s"$lang fertility $fert")
      assert(math.abs(fert - bpe.toDouble / words) < 1e-4)
    }
    // conservation: per-lang sums equal the per-doc textStats totals
    val stats = TextAnalysis.textStats(spark, sf)
      .select($"doc_id", $"n_tokens", $"n_bpe_tokens")
      .join(graft.sources.Tables.documents(spark, sf).select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang")
      .agg(sum($"n_tokens").as("w"), sum($"n_bpe_tokens").as("b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.map(r => r._1 -> (r._2, r._3)).toMap == stats)
  }

  test("lengthBucketedBatches: exhaustive, bucket-homogeneous, fill audit exact") {
    import graft.operators.{Sampling, TextAnalysis}
    val got = TextAnalysis.lengthBucketedBatches(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // every non-empty doc lands in exactly one batch
    val nDocs = graft.sources.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.size(
        TextAnalysis.tokens($"text")).as("n"))
      .filter($"n" >= 1).count()
    assert(got.map(_._4).sum == nDocs)
    got.foreach { case (shard, bucket, batchIdx, n, maxT, sumT, fill) =>
      assert(shard >= 0 && shard < 16 && batchIdx >= 0)
      assert(n >= 1 && n <= 8, s"batch size $n")
      // bucket-homogeneous: the padded width shares the bucket's bit length
      assert(java.lang.Long.toBinaryString(maxT).length == bucket)
      // fill is the exact integer ratio and a batch is at least 50% full:
      // all members share maxT's bit length, so each is > maxT/2
      assert(fill == sumT * 1000000L / (n * maxT))
      assert(fill > 500000L && fill <= 1000000L, s"fill $fill")
      assert(sumT <= n * maxT)
    }
    // only the last batch of a (shard, bucket) run may be ragged
    got.groupBy(t => (t._1, t._2)).foreach { case ((s2, b), rows) =>
      val maxIdx = rows.map(_._3).max
      rows.filter(_._3 < maxIdx).foreach(r =>
        assert(r._4 == 8, s"interior batch ($s2,$b,${r._3}) has ${r._4} docs"))
    }
    // bucketing strictly improves mean fill over one unbucketed batch
    // stream at the same batch size (the point of the operator)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", org.apache.spark.sql.functions.size(
        TextAnalysis.tokens($"text")).cast("long").as("n"))
      .filter($"n" >= 1)
      .as[(Long, Long)].collect().sortBy(_._1)
    val unbucketed = docs.grouped(8).map { g =>
      g.map(_._2).sum.toDouble / (g.length * g.map(_._2).max)
    }.toSeq
    val bucketedMean = got.map(_._7).sum.toDouble / got.length / 1e6
    assert(bucketedMean > unbucketed.sum / unbucketed.length)
  }

  test("paddingWasteReport: identical real mass, bucketing strictly wins") {
    val rows = graft.operators.TextAnalysis.paddingWasteReport(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == Set("bucketed", "sequential"))
    val (bn, br, bp, bf) = rows("bucketed")
    val (sn, sr, sp, sf2) = rows("sequential")
    assert(br == sr) // both strategies batch every non-empty doc once
    assert(bf > sf2, s"bucketed fill $bf not better than sequential $sf2")
    assert(bp < sp) // strictly less padded compute
    assert(bf == br * 1000000L / bp && sf2 == sr * 1000000L / sp)
    assert(bn >= sn) // more, smaller-spread batches is the expected shape
  }
}
