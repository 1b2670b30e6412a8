package graft

import graft.operators.Bpe

/** BPE learn + apply: exact merge order on a crafted corpus, the
  * partition invariant (tokens concatenate back to the word stream),
  * memoized-apply parity, and standing-table consistency.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("learnMerges: exact greedy order with lexicographic tie-break") {
    // "aaab" ×3: pairs aa(×2·3=6), ab(×3) → merge (a,a) first;
    // then symbols [aa,a,b]: pairs (aa,a)=3, (a,b)=3 — tie → (a,b) wins
    // lexicographically ("a" < "aa")
    val merges = Bpe.learnMerges(Seq("aaab" -> 3L), numMerges = 2)
    assert(merges == Seq(("a", "a"), ("a", "b")))

    // merge loop stops when no pairs remain
    val all = Bpe.learnMerges(Seq("ab" -> 1L), numMerges = 10)
    assert(all == Seq(("a", "b")))
  }

  test("applyMerges: greedy lowest-rank, not left-to-right") {
    // ranks: (b,c)=0, (a,b)=1 — in "abc" the lower-rank (b,c) fires first
    // even though (a,b) is further left
    val rank = Map(("b", "c") -> 0, ("a", "b") -> 1)
    assert(Bpe.applyMerges("abc", rank) == Seq("a", "bc"))
    // unknown word → characters
    assert(Bpe.applyMerges("xyz", rank) == Seq("x", "y", "z"))
    // chained: after (b,c), a rank for (a,bc) keeps merging
    val rank2 = Map(("b", "c") -> 0, ("a", "bc") -> 1)
    assert(Bpe.applyMerges("abc", rank2) == Seq("abc"))
  }

  test("learn→apply closes the loop: trained words re-tokenize compactly") {
    val corpus = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.learnMerges(corpus, numMerges = 10)
    val rank = merges.zipWithIndex.toMap
    // "est" must have been learned from newest/widest (count 9 dominates)
    assert(merges.contains(("es", "t")) || merges.contains(("e", "st")) ||
      merges.exists { case (a, b) => (a + b) == "est" })
    // partition invariant: concatenation reproduces the word
    corpus.foreach { case (w, _) =>
      assert(Bpe.applyMerges(w, rank).mkString == w)
    }
    // a trained word compresses below character count
    assert(Bpe.applyMerges("newest", rank).length < "newest".length)
  }

  test("tokenize: partition invariant and memo parity on the fixture") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val merges = Seq(("t", "h"), ("th", "e"), ("a", "b"))
    val out = Bpe.tokenize(docs, merges).persist()
    try {
      assert(out.count() == docs.count())
      // tokens concatenate back to the whitespace-stripped text
      val joined = out.join(docs, "doc_id")
        .select($"tokenized", $"text").as[(String, String)].collect()
      joined.foreach { case (tok, text) =>
        val wordStream = Option(text).map(_.trim.split("\\s+")
          .filter(_.nonEmpty).mkString("")).getOrElse("")
        assert(tok.replace(" ", "") == wordStream)
      }
      // n_tokens column agrees with the stream
      val bad = out.filter(
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split($"tokenized", " ")) =!= $"n_tokens"
          && $"tokenized" =!= "").count()
      assert(bad == 0)
    } finally out.unpersist()
  }

  test("standing fixture merges: deterministic across entries; usage totals match") {
    val m1 = Bpe.mergesEntry(spark, sf).collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    val m2 = Bpe.mergesEntry(spark, sf).collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(m1 == m2 && m1.nonEmpty)
    assert(m1.map(_._1) == m1.indices)

    // total usage across the vocab == total token count across docs
    val usageTotal = Bpe.vocabUsageEntry(spark, sf)
      .agg(org.apache.spark.sql.functions.sum($"n")).as[Long].head()
    val docTotal = Bpe.tokenizedEntry(spark, sf)
      .agg(org.apache.spark.sql.functions.sum($"n_tokens")).as[Long].head()
    assert(usageTotal == docTotal)
  }
}
