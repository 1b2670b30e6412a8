package graft

import org.apache.spark.sql.functions._

import graft.operators.DupSpans

/** Duplicated-span detection/removal (Lee et al. 2022 exact-substring dedup,
  * relational form): positional grams, island merge, and the trim rebuild.
  */
class DupSpansSpec extends SparkTestBase {
  import spark.implicits._

  test("positionalGrams: every start position, order kept, non-distinct") {
    val df = Seq(
      (1L, "a b a b a b"), // repeated grams stay, one per position
      (2L, "a b"),         // shorter than n
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = DupSpans.positionalGrams(df, 3)
      .as[(Long, Int, String)].collect().toSet
    assert(got == Set(
      (1L, 0, "a b a"), (1L, 1, "b a b"), (1L, 2, "a b a"), (1L, 3, "b a b")))
  }

  test("dupSpans: cross-doc repeat found, merged maximal, unique text clean") {
    // docs 1 and 2 share the 10-token run "t0 ... t9"; doc 3 is unique.
    val shared = (0 until 10).map("t" + _).mkString(" ")
    val df = Seq(
      (1L, s"one $shared after"),
      (2L, s"$shared trailing words here"),
      (3L, "entirely unique words with no repeats at all plus padding tokens"))
      .toDF("doc_id", "text")
    val spans = DupSpans.dupSpansOf(df, n = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 1: shared run at token index 1..10 (3 window starts merge to one
    // span); doc 2: same run at 0..9
    assert(spans == Set((1L, 1L, 10L, 10L), (2L, 0L, 9L, 10L)))
  }

  test("dupSpans: within-doc repetition is duplicated text too") {
    val run = (0 until 8).map("r" + _).mkString(" ")
    val df = Seq((1L, s"$run mid $run"), (2L, "unrelated text"))
      .toDF("doc_id", "text")
    val spans = DupSpans.dupSpansOf(df, n = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    // both copies of the run are spans: tokens 0..7 and 9..16
    assert(spans == Set((1L, 0L, 7L, 8L), (1L, 9L, 16L, 8L)))
  }

  test("dupSpans: distinct island groups do not merge across a gap") {
    val a = (0 until 8).map("a" + _).mkString(" ")
    val b = (0 until 8).map("b" + _).mkString(" ")
    val gap = (0 until 9).map("g" + _).mkString(" ") // > n tokens between runs
    val df = Seq(
      (1L, s"$a $gap $b"),
      (2L, a), (3L, b))
      .toDF("doc_id", "text")
    val spans = DupSpans.dupSpansOf(df, n = 8)
      .filter($"doc_id" === 1L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 0L, 7L, 8L), (1L, 17L, 24L, 8L)))
  }

  test("spanTrimmedCorpus: spans cut, span-free docs normalized, all-dup -> ''") {
    val run = (0 until 8).map("d" + _).mkString(" ")
    val df = Seq(
      (1L, s"keep1 $run keep2"), // span in the middle
      (2L, run),                 // the whole doc is the duplicated run
      (3L, "no  dups\there"),    // untouched but whitespace-normalized
      (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = DupSpans.spanTrimmedCorpusOf(df, n = 8)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((10L, 8L, "keep1 keep2")))
    assert(got(2L) == ((8L, 8L, "")))
    assert(got(3L) == ((3L, 0L, "no dups here")))
    assert(got(4L) == ((0L, 0L, "")))
    assert(got(5L) == ((0L, 0L, "")))
  }

  test("longSpanTrimmedCorpus: short repeats kept, long repeats cut; degrades to spanTrimmed at minSpan <= n") {
    val shortRun = (0 until 10).map("s" + _).mkString(" ")  // 10-token repeat
    val longRun = (0 until 20).map("l" + _).mkString(" ")   // 20-token repeat
    val df = Seq(
      (1L, s"a1 $shortRun a2 $longRun a3"),
      (2L, s"b1 $shortRun b2"),
      (3L, s"$longRun c1"))
      .toDF("doc_id", "text")
    val got = DupSpans.longSpanTrimmedCorpusOf(df, n = 8, minSpanTokens = 15)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // the 20-token run crosses the 15-token minimum and is cut; the
    // 10-token run repeats too but stays in place
    assert(got(1L) == ((33L, 20L, s"a1 $shortRun a2 a3")))
    assert(got(2L) == ((12L, 0L, s"b1 $shortRun b2")))
    assert(got(3L) == ((21L, 20L, "c1")))

    // fixed-case equivalence: minSpanTokens <= n filters nothing (every
    // merged span is at least n tokens by construction)
    val fixture = graft.sources.Tables.documents(spark, sf)
    val viaLong = DupSpans.longSpanTrimmedCorpusOf(fixture, n = 8,
      minSpanTokens = 8).as[(Long, Long, Long, String)].collect().toSet
    val viaFixed = DupSpans.spanTrimmedCorpusOf(fixture, n = 8)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(viaLong == viaFixed)
  }

  test("contaminationSpans/Trim: benchmark overlap located and surgically cut") {
    val leak = (0 until 9).map("b" + _).mkString(" ") // 9-token benchmark run
    val corpus = Seq(
      (1L, s"intro words here $leak outro words"), // leak in the middle
      (2L, "completely original prose with no benchmark overlap at all"),
      (3L, leak)) // all-contaminated → trims to ""
      .toDF("doc_id", "text")
    val benchmark = Seq((100L, s"benchmark item containing $leak verbatim"))
      .toDF("doc_id", "text")
    val spans = DupSpans.contaminationSpansOf(corpus, benchmark, n = 8)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: leak starts at token 3, 9 tokens → covered starts 3 and 4
    // merge into one span [3, 11]
    assert(spans(1L) == ((3L, 11L, 9L)))
    assert(spans(3L) == ((0L, 8L, 9L)))
    assert(!spans.contains(2L))
    val trimmed = DupSpans.contaminationTrimmedCorpusOf(corpus, benchmark, n = 8)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(trimmed(1L) == ((14L, 9L, "intro words here outro words")))
    assert(trimmed(2L)._2 == 0L) // untouched
    assert(trimmed(3L) == ((9L, 9L, "")))
  }

  test("fixture-wide: merged spans are disjoint, so dropped == sum of span sizes") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = DupSpans.spanTrimmedCorpus(spark, sf)
    assert(out.count() == docs.count()) // every doc survives (trim, not drop)
    val perDoc = DupSpans.dupSpans(spark, sf)
      .groupBy($"doc_id")
      .agg(sum($"n_span_tokens").as("span_total"), count(lit(1)).as("n_spans"))
    val joined = out.join(perDoc, Seq("doc_id"), "left")
      .withColumn("span_total", coalesce($"span_total", lit(0L)))
    assert(joined.filter($"n_dropped_tokens" =!= $"span_total").count() == 0L)
    // the fixture actually exercises the operator
    assert(joined.filter($"n_dropped_tokens" > 0).count() > 0L)
  }

  test("blockDedup: keep-first semantics on crafted docs") {
    // blockSize=3; doc 1 owns block "a b c"; doc 2 repeats it twice and
    // adds unique material; doc 3 consists ONLY of the duplicated block
    val docs = Seq(
      (1L, "a b c x y z"),
      (2L, "a b c q r s a b c"),    // blocks: "a b c" (dup), "q r s", ragged "a b c" (dup)
      (3L, "a b c"),                // single block, dup of doc 1's first
      (4L, "w"),                    // ragged single-token block, unique
      (5L, "   "),                  // no tokens — excluded entirely
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = DupSpans.blockDedupOf(docs, blockSize = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L)) // 5, 6 have no blocks
    assert(got(1L) == (2L, 2L, "a b c x y z")) // first owner keeps all
    assert(got(2L) == (3L, 1L, "q r s"))       // both dup copies cut
    assert(got(3L) == (1L, 0L, ""))            // fully-duplicated doc stays, empty
    assert(got(4L) == (1L, 1L, "w"))
  }

  test("blockDedup: matches an independent window-based keep-first on the fixture") {
    import org.apache.spark.sql.expressions.Window
    // independent derivation (the oracle's window form) vs the operator's
    // min-struct + broadcast-probe plan: same kept set, same rebuild
    val base = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", graft.operators.TextAnalysis.tokens($"text").as("toks"))
      .filter(size($"toks") > 0)
    val blocks = base
      .select($"doc_id", $"toks", explode(sequence(lit(0),
        floor((size($"toks") - 1).cast("double") / 8).cast("int"))).as("b"))
      .select($"doc_id", $"b".cast("long").as("block_id"),
        array_join(slice($"toks", $"b" * 8 + 1, lit(8)), " ").as("block"))
    val kept = blocks
      .withColumn("rn", row_number().over(
        Window.partitionBy($"block").orderBy($"doc_id", $"block_id")))
      .withColumn("n_occ", count(lit(1)).over(Window.partitionBy($"block")))
      .filter($"n_occ" === 1 || $"rn" === 1)
    val expected = base
      .select($"doc_id", (floor((size($"toks") - 1).cast("double") / 8) + 1)
        .cast("long").as("n_blocks"))
      .join(kept.groupBy($"doc_id").agg(
        count(lit(1)).as("k"),
        array_join(transform(
          sort_array(collect_list(struct($"block_id", $"block"))),
          s => s.getField("block")), " ").as("t")), Seq("doc_id"), "left")
      .select($"doc_id", $"n_blocks",
        coalesce($"k", lit(0L)).as("n_blocks_kept"),
        coalesce($"t", lit("")).as("deduped_text"))
      .as[(Long, Long, Long, String)].collect().toSet
    val got = DupSpans.blockDedupCorpus(spark, sf)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == expected)
    // and the pass actually dropped something on the fixture
    assert(got.exists { case (_, n, k, _) => k < n })
  }
}
