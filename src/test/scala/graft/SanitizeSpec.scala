package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.Sanitize
import graft.tweets.Tweet

/** Sanitizer + interchange codec edge cases (SURVEY.md §5.1, quirks Q1/Q5). */
class SanitizeSpec extends SparkTestBase {
  import spark.implicits._

  private def sanitized(s: String): String =
    Seq(s).toDF("t").select(Sanitize.sanitize($"t")).as[String].head()

  test("null becomes empty string") {
    val r = Seq[(Integer, String)]((1, null)).toDF("id", "t")
      .select(Sanitize.sanitize($"t")).as[String].head()
    assert(r == "")
  }

  test("tabs and double quotes stripped") {
    assert(sanitized("a\tb\"c") == "abc")
  }

  test("comma becomes apostrophe") {
    assert(sanitized("a,b") == "a'b")
  }

  test("control chars stripped (CR, LF, bell)") {
    assert(sanitized("x\r\ny") == "xy")
    assert(sanitized("a\u0007b\u0001c") == "abc")
  }

  test("quirk Q1: the 4-char sequence [+CR+LF+] is removed as one unit") {
    // the reference's .replace("[\r\n]", "") needle is escape-processed by
    // scalac → removes [ + CR + LF + ] wholesale (brackets included)
    assert(sanitized("a[\r\n]b") == "ab")
  }

  test("quirk Q1: the 6-char literal text [\\r\\n] is NOT removed") {
    // backslash-r-backslash-n between brackets is ordinary text to the
    // reference (its needle holds real CR/LF, not backslashes)
    assert(sanitized("a[\\r\\n]b") == "a[\\r\\n]b")
  }

  test("quirk Q1: bracketed CR alone falls through to the control-char strip") {
    // [ + CR + ] does not match the 4-char needle; the \p{C} regex then
    // removes the CR, leaving the brackets — same as the reference
    assert(sanitized("a[\r]b") == "a[]b")
  }

  test("plain text is untouched, emoji survive") {
    assert(sanitized("bonjour le monde 🌍") == "bonjour le monde 🌍")
  }

  test("pipe encode matches the reference line format") {
    val df = Seq(("hello, world", Some(1.5f), Some(-2.25f),
      Some(Timestamp.valueOf("2017-04-23 10:11:12"))))
      .toDF("text", "latitude", "longitude", "created_at")
    val line = df.select(Sanitize.encodePipe($"text", $"latitude", $"longitude",
      $"created_at")).as[String].head()
    assert(line == "hello' world|1.5|-2.25|2017-04-23 10:11:12.0")
  }

  test("missing geo renders as empty fields (reference null handling)") {
    val df = Seq(Tweet("t", None, None, Some(Timestamp.valueOf("2017-04-23 10:11:12"))))
      .toDF()
    val line = df.select(Sanitize.encodePipe($"text", $"latitude", $"longitude",
      $"created_at")).as[String].head()
    assert(line == "t|||2017-04-23 10:11:12.0")
  }

  test("decode inverts encode for sanitized rows") {
    val rows = Seq(
      Tweet("premier tweet #Macron", Some(48.85f), Some(2.35f),
        Some(Timestamp.valueOf("2017-04-23 10:11:12"))),
      Tweet("deuxieme #LePen", None, None,
        Some(Timestamp.valueOf("2017-04-23 10:11:13"))))
    val encoded = rows.toDF().select(Sanitize.encodePipe(
      $"text", $"latitude", $"longitude", $"created_at").as("line"))
    val decoded = encoded.select(Sanitize.decodePipe($"line").as("t"))
      .select($"t.*").as[Tweet].collect().toSeq
    assert(decoded == rows)
  }

  test("timestamp format round-trips through the .0 pattern") {
    val ts = Timestamp.valueOf("2017-04-23 23:59:59")
    val df = Seq(Tuple1(ts)).toDF("ts")
    val txt = df.select(Sanitize.formatCreatedAt($"ts")).as[String].head()
    assert(txt == "2017-04-23 23:59:59.0")
    val back = df.select(Sanitize.parseCreatedAt(lit(txt))).head().getTimestamp(0)
    assert(back == ts)
  }
}
