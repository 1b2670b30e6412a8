package graft.tweets

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** The reference's published relational data model.
  *
  * Single source of truth for the 4-column tweet table declared twice in the
  * reference (code: TwitterStreamingCollector.scala:47-54; DDL:
  * README.md:98-101). Never inferred — always declared (SURVEY.md §1.3).
  */
object TweetSchema {

  /** Published flat table: `twitter_presi(text, latitude, longitude, created_at)`. */
  val struct: StructType = StructType(Seq(
    StructField("text", StringType, nullable = true),
    StructField("latitude", FloatType, nullable = true),
    StructField("longitude", FloatType, nullable = true),
    StructField("created_at", TimestampType, nullable = true),
  ))

  /** In-flight nested shape before projection (SURVEY.md §1.2) — the modern
    * analogue of the twitter4j `Status` object graph the collector flattens
    * (TwitterStreamingCollector.scala:47-54,73-77).
    */
  val statusStruct: StructType = StructType(Seq(
    StructField("text", StringType, nullable = true),
    StructField("user", StructType(Seq(
      StructField("lang", StringType, nullable = true))), nullable = true),
    StructField("geo", StructType(Seq(
      StructField("latitude", DoubleType, nullable = true),
      StructField("longitude", DoubleType, nullable = true))), nullable = true),
    StructField("created_at", TimestampType, nullable = true),
  ))

  /** Hive legacy text-timestamp pattern the collector renders
    * (TwitterStreamingCollector.scala:45: "yyyy-MM-dd HH:mm:ss.0"). The
    * trailing ".0" is a literal under Spark's DateTimeFormatter semantics,
    * so it is quoted here (SURVEY.md §2.2 P4).
    */
  val timestampPattern: String = "yyyy-MM-dd HH:mm:ss'.0'"

  /** Field separator of the interchange text format (Utils.scala:9). */
  val separator: String = "|"

  /** The 7 candidate track keywords (TwitterStreamingCollector.scala:33). */
  val trackKeywords: Seq[String] = Seq(
    "#LePen", "#Macron", "#Fillon", "#JLM2017", "#Hamon",
    "#Mélenchon", "#Sarkozy")
}

/** Typed record for the published table — mirrors the reference's
  * `case class tweet` (README.md:135), with `Option` for nullable columns.
  */
final case class Tweet(
    text: String,
    latitude: Option[Float],
    longitude: Option[Float],
    created_at: Option[Timestamp])

/** Typed in-flight record for the streaming stage (pre-projection). */
final case class TweetUser(lang: String)
final case class TweetGeo(latitude: Double, longitude: Double)
final case class TweetStatus(
    text: String,
    user: TweetUser,
    geo: Option[TweetGeo],
    created_at: Timestamp)
