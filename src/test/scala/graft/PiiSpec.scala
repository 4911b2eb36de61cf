package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pii, TextOps}
import graft.functions.TextFunctions

/** Golden tests for the q345–q349 PII family: known planted strings →
  * exact expected detections, redaction correctness and idempotence,
  * and the sum-merge property the streaming twin rides.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  // hand-built corpus with KNOWN PII at known positions; doc_ids are
  // chosen so the arithmetic plant stays inert (no %3/%4/%5/%6 hits)
  private def golden = Seq(
    (1L, "mail me at alice.smith+spam@corp-mail.example.org today", "en", "web", 50L),
    (7L, "twice a@b.io and c.d@e.co.uk plus phone +1-555-1234", "en", "web", 50L),
    (11L, "server 192.168.1.254 and 10.0.0.1 no mail here", "en", "logs", 40L),
    (13L, "clean document with no contact information at all", "en", "web", 49L),
    (17L, "+1-800-0000 called from 8.8.8.8 by bob@x.ai", "en", "logs", 43L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("detectors find exactly the planted PII") {
    val r = golden.select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(TextOps.EmailRx), lit(0)))
          .as("e"),
        size(regexp_extract_all(col("text"), lit(TextOps.PhoneRx), lit(0)))
          .as("p"),
        size(regexp_extract_all(col("text"), lit(TextOps.IpRx), lit(0)))
          .as("i"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(r.toSeq == Seq(
      (1L, 1, 0, 0), (7L, 2, 1, 0), (11L, 0, 0, 2), (13L, 0, 0, 0),
      (17L, 1, 1, 1)))
  }

  test("redaction replaces every span and is idempotent") {
    val clean = regexp_replace(regexp_replace(regexp_replace(
      col("text"), TextOps.EmailRx, "<EMAIL>"),
      TextOps.PhoneRx, "<PHONE>"), TextOps.IpRx, "<IP>")
    val out = golden.select(col("doc_id"), clean.as("c")).orderBy(col("doc_id"))
      .as[(Long, String)].collect().toMap
    assert(out(7L) == "twice <EMAIL> and <EMAIL> plus phone <PHONE>")
    assert(out(17L) == "<PHONE> called from <IP> by <EMAIL>")
    assert(out(13L) == "clean document with no contact information at all")
    // idempotence: a second pass over the redacted text changes nothing
    val twice = golden.select(col("doc_id"), clean.as("text"))
      .select(col("doc_id"), clean.as("c2"))
      .as[(Long, String)].collect().toMap
    assert(twice == out)
  }

  test("contact-list parse: X1 split, duplicate dropped, sorted") {
    val lists = Seq((1L, " 555-0001, 555-0002; 555-0001/ 555-0003 "),
        (2L, ""), (3L, "555-9999")).toDF("id", "cl")
    val r = lists.select(col("id"),
        array_sort(array_distinct(
          TextFunctions.extractPhones(col("cl")))).as("ph"))
      .orderBy(col("id"))
      .as[(Long, Seq[String])].collect().toSeq
    assert(r == Seq(
      (1L, Seq("555-0001", "555-0002", "555-0003")),
      (2L, Seq.empty[String]), (3L, Seq("555-9999"))))
  }

  test("incidence cells sum-merge: split corpus == whole corpus") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val whole = Pii.incidenceFromCells(Pii.piiCellsOf(docs))
    val halves = Pii.incidenceFromCells(
      Pii.piiCellsOf(docs.filter(col("doc_id") % 2 === 0)).unionByName(
        Pii.piiCellsOf(docs.filter(col("doc_id") % 2 === 1)))
        .groupBy(col("source"), col("kind"))
        .agg(sum(col("cnt")).as("cnt")))
    assert(whole.collect().toSeq == halves.collect().toSeq)
  }
}
