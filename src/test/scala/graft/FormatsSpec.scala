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
