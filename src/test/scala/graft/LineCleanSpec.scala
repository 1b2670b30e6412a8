package graft

import graft.operators.LineClean

/** C4 line-level cleaning: the full published rule set on crafted
  * multi-line pages, plus the fixture entry's behavior on the corpus.
  */
class LineCleanSpec extends SparkTestBase {
  import spark.implicits._

  private val goodLine = "This sentence has more than five words in it."

  test("c4 rules: line drops (punct, word floor, bans) and page drops") {
    val pages = Seq(
      // 1: three clean sentences → kept intact
      (1L, Seq(goodLine, goodLine, goodLine).mkString("\n")),
      // 2: good lines interleaved with droppable ones → lines filtered,
      // page survives (3 kept)
      (2L, Seq(goodLine, "Too short.", goodLine,
        "no terminal punctuation on this line at all",
        "Enable JavaScript to view this page.", goodLine).mkString("\n")),
      // 3: only 2 good lines → page dropped (minKeptLines = 3)
      (3L, Seq(goodLine, goodLine, "tiny").mkString("\n")),
      // 4: lorem ipsum page-level ban
      (4L, Seq(goodLine, goodLine, goodLine,
        "Lorem ipsum dolor sit amet, consectetur adipiscing elit.").mkString("\n")),
      // 5: brace page-level ban (code page)
      (5L, Seq(goodLine, goodLine, goodLine,
        "function f() { return this sentence has many words; }").mkString("\n")),
      // 6: null text
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")

    val out = LineClean.cleanLines(pages, LineClean.c4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap

    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((3L, 3L, Seq(goodLine, goodLine, goodLine).mkString("\n"))))
    // page 2: 6 lines in, exactly the 3 good ones out, order preserved
    assert(out(2L)._1 == 6L && out(2L)._2 == 3L)
    assert(out(2L)._3 == Seq(goodLine, goodLine, goodLine).mkString("\n"))
  }

  test("quote-terminated lines pass the punct rule; whitespace tails allowed") {
    val pages = Seq(
      (1L, Seq(
        "\"A quoted sentence of at least five words.\"",
        "A sentence with a trailing space after the period. ",
        "An exclamation of five whole words!").mkString("\n"))
    ).toDF("doc_id", "text")
    val out = LineClean.cleanLines(pages, LineClean.c4).collect()
    assert(out.length == 1 && out.head.getLong(2) == 3L)
  }

  test("fixture entry: word floor discriminates; counts are consistent") {
    val out = graft.operators.LineClean.lineCleanedCorpus(spark, sf).persist()
    try {
      val n = out.count()
      val total = graft.sources.Tables.documents(spark, sf).count()
      assert(n > 0 && n < total, s"kept $n of $total — rule not discriminating")
      // single-line fixture: every survivor keeps its one line verbatim
      val bad = out.filter($"n_lines" =!= 1L || $"n_lines_kept" =!= 1L).count()
      assert(bad == 0)
      // cleaned text of a survivor equals the original text
      val joined = out.join(
        graft.sources.Tables.documents(spark, sf).select($"doc_id", $"text"),
        "doc_id")
      assert(joined.filter($"cleaned_text" =!= $"text").count() == 0)
    } finally out.unpersist()
  }
}
