package graft

import org.apache.spark.sql.functions._

import graft.operators.Pii

/** PII detection/redaction: crafted-string behavior of the shared
  * Java/RE2-subset patterns, plus the planted-fixture entry's count
  * arithmetic and the no-PII-survives-redaction property.
  */
class PiiSpec extends SparkTestBase {
  import spark.implicits._

  test("redactPii: crafted strings — each class replaced, counts exact") {
    val docs = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org thanks"),
      (2L, "call 555-0123 or 555-9876 now"),
      (3L, "host 10.0.255.1 and 192.168.1.200"),
      (4L, "a@b.co plus 123-4567 plus 1.2.3.4"),
      (5L, "no pii here at all"),
      (6L, "not-a-phone 12-3456 and not-an-ip 1.2.3")) // too-short fragments
      .toDF("doc_id", "text")
    val out = docs.select($"doc_id",
      size(regexp_extract_all($"text", lit(Pii.EmailRe), lit(0))).as("e"),
      size(regexp_extract_all($"text", lit(Pii.PhoneRe), lit(0))).as("p"),
      size(regexp_extract_all($"text", lit(Pii.IpRe), lit(0))).as("i"),
      Pii.redactPii($"text").as("red"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out(1L)._1 == 1 && out(1L)._4 == "mail me at <EMAIL> thanks")
    assert(out(2L)._2 == 2 && out(2L)._4 == "call <PHONE> or <PHONE> now")
    assert(out(3L)._3 == 2 && out(3L)._4 == "host <IP> and <IP>")
    assert(out(4L) == ((1, 1, 1, "<EMAIL> plus <PHONE> plus <IP>")))
    assert(out(5L) == ((0, 0, 0, "no pii here at all")))
    // boundary-guarded patterns leave short fragments alone
    assert(out(6L) == ((0, 0, 0, "not-a-phone 12-3456 and not-an-ip 1.2.3")))
  }

  test("piiRedaction entry: counts follow the planting arithmetic; redaction is total") {
    val rows = Pii.piiRedaction(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_emails") == (if (id % 3 == 0) 1L else 0L), s"doc $id emails")
      assert(r.getAs[Long]("n_phones") == (if (id % 5 == 0) 1L else 0L), s"doc $id phones")
      assert(r.getAs[Long]("n_ips") == (if (id % 11 == 0) 1L else 0L), s"doc $id ips")
    }
    // nothing matching any pattern survives in the redacted text
    val survivors = Pii.piiRedaction(spark, sf)
      .select(
        size(regexp_extract_all($"text_redacted", lit(Pii.EmailRe), lit(0))) +
        size(regexp_extract_all($"text_redacted", lit(Pii.PhoneRe), lit(0))) +
        size(regexp_extract_all($"text_redacted", lit(Pii.IpRe), lit(0))))
      .as[Int].collect()
    assert(survivors.forall(_ == 0))
  }

  test("the sweep is shuffle-free (no Exchange in the plan)") {
    val plan = Pii.piiRedaction(spark, sf).queryExecution.executedPlan
    // spread() may add ONE fan-out exchange on the tiny fixture scan; the
    // sweep itself must add none beyond it
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.length <= 1, s"unexpected exchanges:\n$plan")
  }
}
