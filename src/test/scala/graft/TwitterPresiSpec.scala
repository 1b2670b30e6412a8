package graft

import graft.sources.Tables
import graft.tweets.Tweet

/** The reference's external-table stage end to end (SURVEY.md §2.1 S4/S6,
  * §3.2): pipe-delimited read with the declared schema, the README's SQL run
  * VERBATIM through spark.sql over the registered view, and the typed
  * Dataset[Tweet] path (README.md:105-149).
  */
class TwitterPresiSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val dir: String = {
    Tables.registerTwitterPresi(spark,
      getClass.getResource("/tweets").getPath)
    getClass.getResource("/tweets").getPath
  }

  test("S4: schema-declared pipe read — empty floats are NULL, timestamps parse") {
    val df = Tables.tweetText(spark, dir)
    assert(df.schema.fieldNames.toSeq ==
      Seq("text", "latitude", "longitude", "created_at"))
    assert(df.count() == 10)
    val noGeo = df.filter($"text" === "soutien #LePen ici").head()
    assert(noGeo.isNullAt(1) && noGeo.isNullAt(2)) // "" → NULL (Hive parity)
    assert(noGeo.getTimestamp(3).toString == "2017-04-23 10:11:13.0")
  }

  test("S6: SHOW TABLES lists twitter_presi (README.md:105)") {
    dir // force registration
    val tables = spark.sql("show tables").select("tableName")
      .as[String].collect()
    assert(tables.contains("twitter_presi"))
  }

  test("README SQL verbatim: count, star-scan, limit, NOT NULL") {
    dir
    // README.md:107
    assert(spark.sql("select count(*) from twitter_presi").head().getLong(0) == 10)
    // README.md:121-122
    assert(spark.sql("select * from twitter_presi").limit(2).count() == 2)
    // README.md:126
    assert(spark.sql("select text from twitter_presi limit 2").count() == 2)
    // README.md:156 — one row has NULL text
    assert(spark.sql(
      "select text from twitter_presi where text is not null").count() == 9)
  }

  test("typed Dataset[Tweet] path (README.md:135-139)") {
    dir
    val tweets = spark.sql("select * from twitter_presi").as[Tweet].collect()
    assert(tweets.length == 10)
    val macron = tweets.filter(_.text == "vive #Macron demain")
    assert(macron.length == 3) // duplicate texts present by construction
    assert(macron.exists(t => t.latitude.contains(48.85f)))
    assert(macron.exists(t => t.latitude.isEmpty))
    assert(tweets.exists(t => t.text == null)) // the NULL-text row survives typing
    assert(tweets.exists(t => t.created_at.isEmpty)) // null timestamp row
  }

  test("wordCounts: groupBy(text).count() over the view (README.md:149, Q6)") {
    dir
    val counts = spark.sql(
      "select text, count(*) as n from twitter_presi group by text")
      .as[(String, Long)].collect().toMap
    assert(counts("vive #Macron demain") == 3)
    assert(counts("soutien #LePen ici") == 1)
    assert(counts.size == 8) // 7 distinct texts + the NULL group
  }
}
