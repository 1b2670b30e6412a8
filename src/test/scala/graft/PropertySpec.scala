package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Sanitize
import graft.operators.Dedup

/** Property-style invariants (SURVEY.md §5.2) over ScalaCheck-generated
  * corpora. Each property evaluates in ONE Spark pass over a generated
  * DataFrame (per-case Spark jobs would dominate the suite's runtime).
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  // strings over a troublesome alphabet: pipes, quotes, tabs, CR/LF,
  // brackets, commas, unicode, control chars
  private val nastyString: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('|', '"', '\t', '\r',
      '\n', '\f', '\u000B', '[', ']', ',', '', 'é', '☺', ' '))).map(_.mkString)

  // the pipe-delimited interchange format cannot carry '|' inside a field
  // (the reference shares this limitation — its sanitizer never strips the
  // separator), so round-trip properties use a pipe-free alphabet
  private val pipeFreeString: Gen[String] = nastyString.map(_.replace('|', '/'))

  test("sanitize is idempotent and output is free of stripped characters") {
    val rows = sample(nastyString, 300)
    val out = rows.toDF("t")
      .select(Sanitize.sanitize($"t").as("once"))
      .select($"once", Sanitize.sanitize($"once").as("twice"))
      .as[(String, String)].collect()
    out.foreach { case (once, twice) =>
      assert(once == twice, s"not idempotent: $once")
      assert(!once.exists(c => c == '\t' || c == '"' || c == ','),
        s"stripped char survived: $once")
      assert(!once.exists(_.isControl), s"control char survived: $once")
    }
  }

  test("decodePipe inverts encodePipe for sanitized rows") {
    val gen = for {
      t <- pipeFreeString
      lat <- Gen.option(Gen.chooseNum(-90f, 90f))
      lon <- Gen.option(Gen.chooseNum(-180f, 180f))
      // second-granularity epochs inside a sane range; format has no millis
      s <- Gen.chooseNum(0L, 1700000000L)
    } yield (t, lat, lon, new Timestamp(s * 1000))
    val rows = sample(gen, 200)
    val decoded = rows.toDF("text", "lat", "lon", "created_at")
      .select(Sanitize.encodePipe($"text", $"lat", $"lon", $"created_at").as("line"))
      .select(Sanitize.decodePipe($"line").as("r"))
      .select($"r.text", $"r.latitude", $"r.longitude", $"r.created_at")
      .as[(String, Option[Float], Option[Float], Timestamp)].collect()
    rows.zip(decoded).foreach { case ((t, lat, lon, ts), (t2, lat2, lon2, ts2)) =>
      // text round-trips through its sanitized form ("" decodes as NULL)
      val sanitized = Seq(t).toDF("t").select(Sanitize.sanitize($"t"))
        .as[String].head()
      val expectText = if (sanitized.isEmpty) null else sanitized
      assert(t2 == expectText, s"text: '$t' -> '$t2' != '$expectText'")
      // floats survive via their string rendering
      assert(lat2.map(_.toString) == lat.map(_.toString), s"lat: $lat -> $lat2")
      assert(lon2.map(_.toString) == lon.map(_.toString), s"lon: $lon -> $lon2")
      assert(ts2 == ts, s"ts: $ts -> $ts2")
    }
  }

  test("charShingles: width n, count bound, distinct, membership") {
    val rows = sample(nastyString, 300)
    val out = rows.toDF("t")
      .select($"t", Dedup.charShingles($"t", 3).as("sh"))
      .as[(String, Seq[String])].collect()
    out.foreach { case (t, sh) =>
      assert(sh.forall(_.length == 3))
      assert(sh.length <= math.max(0, t.length - 2))
      assert(sh.distinct.length == sh.length, "shingles must be distinct")
      assert(sh.forall(t.contains(_)), "every shingle occurs in the text")
    }
  }

  test("tokenNgrams: n tokens per gram, count bound, distinct, reconstructible") {
    val rows = sample(nastyString, 300)
    val out = rows.toDF("t")
      .select($"t", graft.operators.Decontamination.tokenNgrams($"t", 3).as("g"))
      .as[(String, Seq[String])].collect()
    out.foreach { case (t, grams) =>
      // replicate the operator's tokenization exactly: Spark's trim strips
      // SPACES only (tab/CR-led strings keep a leading empty token after
      // the regex split — same on the DuckDB oracle side)
      // (and Spark's split keeps TRAILING empty tokens — Java limit -1).
      // The separator class is the explicit RE2-compatible [ \t\n\r\f] —
      // NOT Java's \s, which also matches \u000B (the generator includes
      // \u000B precisely to pin that it stays a token character, matching
      // DuckDB's string_split_regex semantics)
      val trimmed = t.replaceAll("^ +", "").replaceAll(" +$", "")
      val toks: Seq[String] =
        if (trimmed.isEmpty) Seq.empty
        else trimmed.split("[ \t\n\r\f]+", -1).toSeq
      grams.foreach { g =>
        assert(g.split(" ", -1).length == 3, s"'$g' is not 3 tokens")
        // every gram is a consecutive token window of the source
        assert(toks.sliding(3).exists(_.mkString(" ") == g),
          s"'$g' is not a window of $toks")
      }
      assert(grams.length <= math.max(0, toks.length - 2))
      assert(grams.distinct.length == grams.length)
      // completeness: every window appears (dedup aside)
      if (toks.length >= 3)
        assert(toks.sliding(3).map(_.mkString(" ")).toSet == grams.toSet)
    }
  }

  test("tokenNgramsPos: positional EXACTLY the sliding windows, distinct form is its dedup") {
    val rows = sample(nastyString, 300)
    val out = rows.toDF("t")
      .select($"t",
        graft.functions.TextExpressions.tokenNgramsPos($"t", 3).as("p"),
        graft.operators.Decontamination.tokenNgrams($"t", 3).as("g"))
      .as[(String, Seq[String], Seq[String])].collect()
    out.foreach { case (t, pos, distinct) =>
      val trimmed = t.replaceAll("^ +", "").replaceAll(" +$", "")
      val toks: Seq[String] =
        if (trimmed.isEmpty) Seq.empty
        else trimmed.split("[ \t\n\r\f]+", -1).toSeq
      // element i IS the window at token i — order, multiplicity, length
      assert(pos == toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq,
        s"positional grams of $toks")
      // and the distinct family is exactly its first-seen dedup
      assert(pos.distinct == distinct)
    }
  }

  test("as-of join equals the brute-force maximum-earlier-right on random data") {
    // random (key, time) points both sides; Spark result must equal the
    // reference semantics computed in plain Scala: for each left row, the
    // right row with max time strictly below it on the same key
    val keyGen = Gen.choose(1L, 5L)
    val timeGen = Gen.choose(0L, 2000L) // µs offsets — sub-second ties likely
    val lefts = sample(Gen.zip(keyGen, timeGen), 120).zipWithIndex
      .map { case ((k, t), i) => (i.toLong, k, new Timestamp(t)) }
    val rights = sample(Gen.zip(keyGen, timeGen), 60)
      .groupBy(identity).keys.toList.zipWithIndex // unique per (key,time)
      .map { case ((k, t), i) => (k, new Timestamp(t), 1000L + i) }

    val out = graft.operators.AsOf.joinAsOf(
      lefts.toDF("id", "k", "t"), rights.toDF("k", "t", "v"),
      key = "k", time = "t", payload = Seq("v"))
      .select($"id", $"v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    lefts.foreach { case (id, k, t) =>
      val expect = rights.filter(r => r._1 == k && r._2.getTime < t.getTime)
        .sortBy(_._2.getTime).lastOption.map(_._3)
      assert(out(id) == expect, s"left $id key $k t $t")
    }
  }

  test("range join equals the brute-force containment filter on random data") {
    val keyGen = Gen.choose(1L, 4L)
    val timeGen = Gen.choose(0L, 500000L) // ms-scale offsets across buckets
    val lefts = sample(Gen.zip(keyGen, timeGen), 100).zipWithIndex
      .map { case ((k, t), i) => (i.toLong, k, new Timestamp(t)) }
    val rights = sample(Gen.zip(keyGen, Gen.zip(timeGen, Gen.choose(0L, 200000L))), 40)
      .zipWithIndex.map { case ((k, (s, len)), i) =>
        (k, new Timestamp(s), new Timestamp(s + len), 100L + i) }

    val out = graft.operators.RangeJoin.joinRange(
      lefts.toDF("id", "k", "t"), rights.toDF("k", "s", "e", "iv"),
      key = "k", time = "t", start = "s", end = "e", payload = Seq("iv"),
      bucketWidthSec = 60L) // small buckets → intervals span many
      .select($"id", $"iv").as[(Long, Long)].collect().toSet
    val expect = (for {
      (id, k, t) <- lefts
      (rk, s, e, iv) <- rights
      if rk == k && t.getTime >= s.getTime && t.getTime <= e.getTime
    } yield (id, iv)).toSet
    assert(out == expect)
  }

  test("near-dup candidate superset: exact duplicates always collide") {
    // pad to ≥ shingle length (suchThat retries can exhaust Gen.apply)
    val texts = sample(nastyString.map(s => if (s.length < 5) s + "abcde" else s), 40)
    // each text twice with distinct ids: every (2i, 2i+1) pair is an exact dup
    val docs = texts.zipWithIndex.flatMap { case (t, i) =>
      Seq((2L * i, t), (2L * i + 1, t))
    }.toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairsOf(docs)
      .select($"a_doc_id", $"b_doc_id").as[(Long, Long)].collect().toSet
    texts.indices.foreach { i =>
      assert(pairs.contains((2L * i, 2L * i + 1)),
        s"exact dup pair ${2 * i}/${2 * i + 1} missed")
    }
  }

  test("line cleaning is idempotent: clean(clean(x)) == clean(x)") {
    import graft.operators.LineClean
    // random multi-line pages: each line a random word sequence, sometimes
    // punctuated, sometimes carrying a banned substring
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
      "javascript", "lorem", "ipsum", "{brace}")
    val line = for {
      ws <- Gen.listOf(word)
      end <- Gen.oneOf(".", "!", "?", "", " ", "...")
    } yield ws.mkString(" ") + end
    val page = Gen.listOf(line).map(_.mkString("\n"))
    val docs = sample(page, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val once = LineClean.cleanLines(docs, LineClean.c4)
      .select($"doc_id", $"cleaned_text").persist()
    try {
      val twice = LineClean.cleanLines(
        once.select($"doc_id", $"cleaned_text".as("text")), LineClean.c4)
      // every survivor survives again, with byte-identical text and counts
      val joined = once.join(twice.select($"doc_id",
        $"n_lines_kept", $"cleaned_text".as("again")), "doc_id")
      assert(twice.count() == once.count())
      assert(joined.filter($"cleaned_text" =!= $"again").count() == 0)
      // and kept lines all individually satisfy the line rules
      val offenders = twice.filter($"n_lines" =!= $"n_lines_kept").count()
      assert(offenders == 0, "a kept line failed the rules on re-clean")
    } finally once.unpersist()
  }

  test("BPE partition invariant on random words and random learned merges") {
    import graft.operators.Bpe
    val word = Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
      .suchThat(_.nonEmpty)
    val corpus = sample(Gen.zip(word, Gen.chooseNum(1L, 50L)), 60)
    val merges = Bpe.learnMerges(corpus, numMerges = 30)
    val rank = merges.zipWithIndex.toMap
    // tokens always concatenate back to the word; never empty for a
    // non-empty word; token count never exceeds char count
    sample(word, 200).foreach { w =>
      val toks = Bpe.applyMerges(w, rank)
      assert(toks.mkString == w)
      assert(toks.nonEmpty && toks.length <= w.length)
      assert(toks.forall(_.nonEmpty))
    }
    // learn determinism: same corpus → same merges
    assert(Bpe.learnMerges(corpus, numMerges = 30) == merges)
  }

  test("round6 equals Spark's round(col, 6) on degenerate, boundary, and random doubles") {
    import graft.functions.VectorHashImpl.round6
    // the values a hand-rolled scorer must agree on: specials, exact
    // half-boundary neighborhoods at 6 dp (HALF_UP's decision points,
    // including ulp-adjacent doubles on both sides), and random magnitudes
    val boundary = (0 until 40).flatMap { i =>
      val base = (i * 7 + 1) * 5e-7 + i.toDouble // …x.xxxxx5-ish points
      Seq(base, Math.nextUp(base), Math.nextDown(base), -base)
    }
    val specials = Seq(Double.NaN, 0.0, -0.0, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue, 1e-7, -1e-7,
      123.4567895, -123.4567895, 1e15, 1e16, -1e16)
    val rnd = sample(Gen.choose(-1e6, 1e6), 300) ++
      sample(Gen.choose(-10.0, 10.0), 300)
    val vals = (specials ++ boundary ++ rnd).toSeq
    val viaPlan = vals.toDF("x").select(round($"x", 6).as("r"))
      .as[Double].collect()
    vals.zip(viaPlan).foreach { case (x, r) =>
      assert(java.lang.Double.compare(round6(x), r) == 0 ||
        (r.isNaN && round6(x).isNaN),
        s"round6($x) = ${round6(x)} but Spark round gives $r")
    }
  }

  test("TopKScoredBuf equals the nanSafe sort prefix under any insertion order, incl. NaN/-0.0/dups") {
    import graft.functions.TopKScoredBuf
    // scores drawn from a degenerate-heavy pool: NaN, ±0.0, infinities,
    // exact ties — the cases a hand-rolled double comparator gets wrong
    val score: Gen[Double] = Gen.oneOf(
      Gen.oneOf(Double.NaN, 0.0, -0.0, Double.PositiveInfinity,
        Double.NegativeInfinity, 0.5, -0.5),
      Gen.choose(-1.0, 1.0))
    val entry: Gen[(Double, Long)] =
      for { s <- score; id <- Gen.choose(0L, 20L) } yield (s, id)
    // the window form's order: Spark's SQLOrderingUtil.compareDoubles —
    // primitive == first (so -0.0 EQUALS 0.0 and the tie falls to id),
    // Double.compare past that (NaN above everything) — score DESC,
    // id ASC; row_number keeps the first k
    val ord = Ordering.fromLessThan[(Double, Long)] { (a, b) =>
      val c =
        if (a._1 == b._1) 0 else java.lang.Double.compare(b._1, a._1) // desc
      c < 0 || (c == 0 && a._2 < b._2)
    }
    // ±0.0 are ORDER-BY-equal, so which sign survives a full (score, id)
    // tie is insertion-order arbitrary (as it is among Spark's tied rows);
    // canonicalize the zero sign before comparing
    def canon(x: Double): Double = if (x == 0.0) 0.0 else x
    (1 to 50).foreach { i =>
      val entries = sample(entry, 1 + i % 37)
      val k = 1 + i % 7
      val expected = entries.sorted(ord).take(k)
      // any split into partial buffers + any merge order must agree
      val whole = new TopKScoredBuf(k)
      entries.foreach { case (s, id) => whole.insert(s, id) }
      def contents(b: TopKScoredBuf) =
        (0 until b.n).map(j => (b.scores(j), b.ids(j))).toList
      assert(contents(whole).map(t => (canon(t._1).toString, t._2)) ==
        expected.map(t => (canon(t._1).toString, t._2)),
        s"case $i whole-buffer")
      val (l, r) = entries.splitAt(entries.length / 2)
      val a = new TopKScoredBuf(k)
      val b = new TopKScoredBuf(k)
      l.foreach { case (s, id) => a.insert(s, id) }
      r.reverse.foreach { case (s, id) => b.insert(s, id) }
      a.mergeFrom(b)
      assert(contents(a).map(t => (canon(t._1).toString, t._2)) ==
        expected.map(t => (canon(t._1).toString, t._2)), s"case $i merged")
    }
  }
}
