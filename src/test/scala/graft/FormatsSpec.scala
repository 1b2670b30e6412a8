package graft

import java.nio.file.Files

import graft.sources.Tables

/** Storage-format breadth: the engine's tables round-trip losslessly
  * through the formats a lake actually serves — Parquet (canonical), ORC
  * (second columnar), JSON lines, and the reference's pipe-CSV (already
  * covered by TwitterPresiSpec/SanitizeSpec). Schema is always declared on
  * read — inference at 100 TB is an extra full scan.
  */
class FormatsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(tag: String) =
    Files.createTempDirectory(s"graft-fmt-$tag").toString

  test("documents round-trip through ORC with schema and values intact") {
    val docs = Tables.documents(spark, sf)
    val dir = tmp("orc") + "/docs"
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(docs.schema).orc(dir)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    val a = docs.orderBy($"doc_id").collect().map(_.toString)
    val b = back.orderBy($"doc_id").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("events round-trip through JSON lines with declared schema") {
    val ev = Tables.events(spark, sf)
    val dir = tmp("json") + "/events"
    // the DEFAULT timestampFormat truncates to milliseconds — the fixture
    // carries microseconds, so both sides must declare a µs pattern or the
    // round-trip silently loses precision (pinned here as a gotcha)
    val usFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ev.write.mode("overwrite").option("timestampFormat", usFormat).json(dir)
    val back = spark.read.schema(ev.schema)
      .option("timestampFormat", usFormat).json(dir)
    assert(back.count() == ev.count())
    val a = ev.orderBy($"event_id").collect().map(_.toString)
    val b = back.orderBy($"event_id").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("events loader adapts to both ts encodings (legacy nanos-long and timestamp)") {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.TimestampType
    val ev = Tables.events(spark, sf)

    // encoding A: plain timestamp[us] (current fixture generation)
    val dirTs = tmp("ev-ts")
    ev.write.mode("overwrite").parquet(s"$dirTs/events.parquet")
    val backTs = Tables.events(spark, dirTs)
    assert(backTs.schema("ts").dataType == TimestampType)

    // encoding B: legacy TIMESTAMP(NANOS) read as raw long (SPARK-40819 path)
    val dirNs = tmp("ev-ns")
    ev.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .write.mode("overwrite").parquet(s"$dirNs/events.parquet")
    val backNs = Tables.events(spark, dirNs)
    assert(backNs.schema("ts").dataType == TimestampType)

    // both decode to the same instants as the source
    val want = ev.orderBy($"event_id").select($"event_id", $"ts").collect().map(_.toString)
    assert(backTs.orderBy($"event_id").select($"event_id", $"ts").collect().map(_.toString).sameElements(want))
    assert(backNs.orderBy($"event_id").select($"event_id", $"ts").collect().map(_.toString).sameElements(want))

    // any third encoding is a loud single-line diagnostic, not 13 downstream breaks
    val dirStr = tmp("ev-str")
    ev.withColumn("ts", $"ts".cast("string"))
      .write.mode("overwrite").parquet(s"$dirStr/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dirStr))
    assert(e.getMessage.contains("events.ts"))
  }

  test("embeddings (float arrays) survive an ORC round-trip bit-exactly") {
    val emb = Tables.embeddings(spark, sf)
    val dir = tmp("orc-emb") + "/emb"
    emb.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(emb.schema).orc(dir)
    val a = emb.orderBy($"vec_id").select($"embedding")
      .as[Seq[Float]].collect()
    val b = back.orderBy($"vec_id").select($"embedding")
      .as[Seq[Float]].collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }
}
