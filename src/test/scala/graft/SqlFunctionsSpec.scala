package graft

import org.apache.spark.sql.functions.{array_intersect, size}

import graft.functions.TextExpressions
import graft.operators.Dedup

/** GraftExtensions SQL registration + native set-op expression: the custom
  * expressions are reachable from `spark.sql`, and agree with both the
  * DataFrame API path and the built-ins they replace.
  */
class SqlFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("graft expressions callable from SQL via GraftExtensions") {
    val cos = spark.sql(
      "SELECT cosine_sim(array(float(1.0), float(0.0)), array(float(1.0), float(0.0)))")
      .head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)

    val sh = spark.sql("SELECT char_shingles('abcd', 3)").head.getSeq[String](0)
    assert(sh == Seq("abc", "bcd"))

    val bands = spark.sql("SELECT minhash_bands('hello world hello', 5, 4, 2)")
      .head.getSeq[Long](0)
    assert(bands.length == 4)

    assert(spark.sql("SELECT simhash64('hello world again', 5)").head.getLong(0) != 0L)

    val fp = spark.sql("SELECT min_md5_shingles('abcdefghij', 8)").head.getString(0)
    assert(fp.length == 32 && fp.forall(c => c.isDigit || ('a' to 'f').contains(c)))

    val grams = spark.sql("SELECT token_ngrams('a b c d', 3)").head.getSeq[String](0)
    assert(grams == Seq("a b c", "b c d"))

    // SQL and DataFrame paths resolve to the same expression
    val viaDf = Seq("abcd").toDF("t")
      .select(Dedup.charShingles($"t", 3)).head.getSeq[String](0)
    assert(viaDf == sh)
  }

  test("redact_pii / shard_of / hash_gate SQL forms match the operator API") {
    import graft.operators.Sampling
    val red = spark.sql(
      "SELECT redact_pii('mail a@b.co or 555-1234 at 1.2.3.4')").head.getString(0)
    assert(red == "mail <EMAIL> or <PHONE> at <IP>")
    val ids = (0L until 200L).toDF("id")
    ids.createOrReplaceTempView("ids_tmp")
    val viaSql = spark.sql("SELECT id, shard_of(id, 16) AS s FROM ids_tmp")
      .as[(Long, Long)].collect().toMap
    val viaApi = ids.select($"id", Sampling.shardOf($"id", 16).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(viaSql == viaApi)
    val gateSql = spark.sql("SELECT id FROM ids_tmp WHERE hash_gate(id, 0.25)")
      .as[Long].collect().toSet
    val gateApi = ids.filter(Sampling.hashGate($"id", 0.25))
      .as[Long].collect().toSet
    assert(gateSql == gateApi)
  }

  test("ngram_jaccard: identity 1.0, disjoint 0.0, short/null → NULL, matches set-op form") {
    assert(spark.sql("SELECT ngram_jaccard('abcdef', 'abcdef', 3)").head.getDouble(0) == 1.0)
    assert(spark.sql("SELECT ngram_jaccard('aaaa', 'bbbb', 3)").head.getDouble(0) == 0.0)
    assert(spark.sql("SELECT ngram_jaccard('ab', 'abcdef', 3)").head.isNullAt(0))
    assert(spark.sql("SELECT ngram_jaccard(NULL, 'abcdef', 3)").head.isNullAt(0))
    // fused expression equals the compositional set-op form
    val (a, b) = ("the quick brown fox", "the quick brown dog")
    val fused = spark.sql(s"SELECT ngram_jaccard('$a', '$b', 4)").head.getDouble(0)
    val viaSets = Seq((a, b)).toDF("a", "b")
      .select((size(array_intersect(TextExpressions.charShingles($"a", 4),
        TextExpressions.charShingles($"b", 4))).cast("double") /
        size(org.apache.spark.sql.functions.array_union(
          TextExpressions.charShingles($"a", 4),
          TextExpressions.charShingles($"b", 4)))))
      .head.getDouble(0)
    assert(math.abs(fused - viaSets) < 1e-12)
  }

  test("non-literal geometry argument is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT char_shingles('abc', 1 + 2)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("setIntersectSize agrees with size(array_intersect) on distinct sets") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("x")),
      (Seq.empty[String], Seq("x")),
      (Seq("p", "q"), Seq.empty[String]))
      .toDF("a", "b")
    df.select(
      TextExpressions.setIntersectSize($"a", $"b").as("native"),
      size(array_intersect($"a", $"b")).as("builtin"))
      .as[(Int, Int)].collect()
      .foreach { case (n, m) => assert(n == m) }
  }
}
