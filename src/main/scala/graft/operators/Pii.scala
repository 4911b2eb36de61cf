package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Tables

/** PII detection / redaction family (q345–q349) — the curation stage
  * between dedup and quality filtering in a training-data pipeline:
  * find contact information, report its incidence per source, write a
  * scrubbed copy, and keep the incidence report maintained as the
  * corpus streams in. Extends q82's per-document redaction (which
  * pinned cross-engine regex parity) with the corpus-level reports a
  * pipeline operator actually consumes, and reuses the reference's own
  * contact-point domain: the X1 `extractPhones` machinery
  * (`functions/TextFunctions.scala`, reference
  * `src/services/groupContact.js:2-9`) drives the multi-value contact
  * parse.
  *
  * The fixture corpus is digit-free by construction, so every query
  * runs its REAL detectors over a deterministically PLANTED corpus —
  * the same arithmetic plant spelled in both engines (the q82/q117
  * discipline). What the oracle certifies is the detector semantics:
  * extraction counts, incidence aggregation, replacement, multi-value
  * parsing — byte-identical across Spark's Java regex and DuckDB's
  * RE2 on the shared dialect subset.
  *
  * 100 TB shape: every detector is a row-local codegen'd regex inside
  * the scan; only (source, kind, count) cells or doc_id-keyed audit
  * rows ever shuffle — never text. The streaming twin maintains the
  * same cells with one sum-merge per micro-batch.
  */
object Pii {

  /** Deterministic conditional plant: ~1/3 of docs gain an email,
    * ~1/4 a phone, ~1/5 an IPv4 literal (overlapping, so multi-PII
    * docs exist); the rest stay clean — incidence is a real
    * distribution, not 100%. Mirrored verbatim in the oracle CTE.
    */
  private[graft] def plantedRaw: Column = concat(
    col("text"),
    when(col("doc_id") % 3 === 0,
      concat(lit(" contact user"), pmod(col("doc_id"), lit(50)),
        lit("@example.com"))).otherwise(lit("")),
    when(col("doc_id") % 4 === 0,
      concat(lit(" call +1-"),
        lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
        lit("-"),
        lpad(pmod(col("doc_id") * 3, lit(10000)).cast("string"), 4, "0")))
      .otherwise(lit("")),
    when(col("doc_id") % 5 === 0,
      concat(lit(" from 10.0."), pmod(col("doc_id"), lit(256)),
        lit("."), pmod(col("doc_id") * 7, lit(256))))
      .otherwise(lit("")))

  private def hits(c: Column, rx: String): Column =
    size(regexp_extract_all(c, lit(rx), lit(0))).cast("long")

  /** The scrubbed text: every PII span replaced by its typed
    * placeholder, in fixed email → phone → ip order so engines can't
    * disagree on overlaps. Shared by the q348 writer and the
    * q353/q354 yield cells.
    */
  private[graft] def cleanCol: Column =
    regexp_replace(regexp_replace(regexp_replace(
      plantedRaw, TextOps.EmailRx, "<EMAIL>"),
      TextOps.PhoneRx, "<PHONE>"), TextOps.IpRx, "<IP>")

  /** Per-(source, kind) sufficient-statistic cells for the incidence
    * report: 'docs', 'docs_pii', 'email', 'phone', 'ip', 'chars' —
    * every kind a plain long that SUM-merges across micro-batches, so
    * q345's batch report and q349's maintained one share this core
    * (the q319/q340 stat/merge/finish discipline).
    */
  def piiCellsOf(docs: DataFrame): DataFrame = {
    val scored = docs.select(col("source"),
      length(plantedRaw).cast("long").as("n_chars_raw"),
      length(cleanCol).cast("long").as("n_chars_clean"),
      hits(plantedRaw, TextOps.EmailRx).as("n_email"),
      hits(plantedRaw, TextOps.PhoneRx).as("n_phone"),
      hits(plantedRaw, TextOps.IpRx).as("n_ip"))
    val isPii = col("n_email") + col("n_phone") + col("n_ip") > 0
    scored.groupBy(col("source")).agg(
        count(lit(1)).as("docs"),
        sum(when(isPii, 1L).otherwise(0L)).as("docs_pii"),
        sum(col("n_email")).as("email"),
        sum(col("n_phone")).as("phone"),
        sum(col("n_ip")).as("ip"),
        sum(col("n_chars_raw")).as("chars"),
        // rewrite-cost cells (q353/q354): raw/clean char mass of the
        // DOCS THAT CHANGE — extra kinds ride the same state; the
        // q345 pivot reads only its own kinds, so adding these is
        // output-invariant for the incidence report
        sum(when(isPii, col("n_chars_raw")).otherwise(0L))
          .as("chars_red_in"),
        sum(when(isPii, col("n_chars_clean")).otherwise(0L))
          .as("chars_red_out"))
      .select(col("source"), expr(
        "stack(8, 'docs', docs, 'docs_pii', docs_pii, 'email', email, " +
          "'phone', phone, 'ip', ip, 'chars', chars, " +
          "'chars_red_in', chars_red_in, 'chars_red_out', chars_red_out) " +
          "as (kind, cnt)"))
  }

  /** Drain/finish: pivot the cells back into the per-source report.
    * `pii_per_10k` divides two exactly-merged longs once at the end —
    * IEEE-identical in any engine and under any batching.
    */
  def incidenceFromCells(cells: DataFrame): DataFrame = {
    def k(kind: String) =
      sum(when(col("kind") === kind, col("cnt")).otherwise(0L))
    cells.groupBy(col("source")).agg(
        k("docs").as("n_docs"), k("docs_pii").as("n_docs_pii"),
        k("email").as("n_email"), k("phone").as("n_phone"),
        k("ip").as("n_ip"), k("chars").as("n_chars"))
      .select(col("source"), col("n_docs"), col("n_docs_pii"),
        col("n_email"), col("n_phone"), col("n_ip"),
        ((col("n_email") + col("n_phone") + col("n_ip")) * 10000L)
          .cast("double")./(col("n_chars").cast("double"))
          .as("pii_per_10k"))
      .orderBy(col("source"))
  }

  /** Redaction-yield forecast off the same cells (q353/q354): per
    * source, how much work the scrubbing pass is — docs that change,
    * spans to replace, raw/clean char mass of the changing docs and
    * the byte delta (placeholders shrink or grow the text). The table
    * that sizes the rewrite job BEFORE the corpus-wide pass is paid;
    * all exact integers, sum-merged, so the streaming twin shares the
    * batch oracle verbatim.
    */
  def yieldFromCells(cells: DataFrame): DataFrame = {
    def k(kind: String) =
      sum(when(col("kind") === kind, col("cnt")).otherwise(0L))
    cells.groupBy(col("source")).agg(
        k("docs_pii").as("n_docs_pii"),
        (k("email") + k("phone") + k("ip")).as("n_spans"),
        k("chars_red_in").as("chars_in"),
        k("chars_red_out").as("chars_out"))
      .select(col("source"), col("n_docs_pii"), col("n_spans"),
        col("chars_in"), col("chars_out"),
        (col("chars_out") - col("chars_in")).as("chars_delta"))
      .orderBy(col("source"))
  }

  /** Redaction yield, batch form (q353). */
  def redactionYield(spark: SparkSession, dir: String): DataFrame =
    yieldFromCells(piiCellsOf(Tables.documents(spark, dir)))

  /** Per-source PII incidence report (q345): docs scanned, docs with
    * any PII, hits by type, and hits per 10k chars — the table that
    * decides which source needs the scrubbing pass before any
    * corpus-wide redaction is paid.
    */
  def piiIncidence(spark: SparkSession, dir: String): DataFrame =
    incidenceFromCells(piiCellsOf(Tables.documents(spark, dir)))

  /** Multi-value contact extraction (q346): the reference's X1
    * `extractPhones` parse (space-strip → split on `[,;/]+` → trim →
    * drop empties, `groupContact.js:2-9`) over a planted contact-list
    * field that includes a DUPLICATE entry, then distinct + sort —
    * per doc, how many unique phones appear and which. Pure HOF
    * built-ins; rows only for docs that carry a contact list.
    */
  def contactExtract(spark: SparkSession, dir: String): DataFrame = {
    val contactList = when(col("doc_id") % 6 === 0, concat(
      lit(" 555-"), lpad(pmod(col("doc_id"), lit(97)).cast("string"), 4, "0"),
      lit(", 555-"), lpad(pmod(col("doc_id"), lit(89)).cast("string"), 4, "0"),
      lit("; 555-"), lpad(pmod(col("doc_id"), lit(97)).cast("string"), 4, "0")))
      .otherwise(lit(""))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_sort(array_distinct(TextFunctions.extractPhones(contactList)))
          .as("ph"))
      .select(col("doc_id"), size(col("ph")).cast("long").as("n_phones"),
        array_join(col("ph"), ",").as("phones"))
      .filter(col("n_phones") > 0)
      .orderBy(col("doc_id"))
  }

  /** Event-property PII audit (q347): the detector pass over
    * `events.props` — the reference's contact-point payloads — with a
    * planted email on every 13th event. Per event type: events
    * scanned, events carrying contact info, and DISTINCT users whose
    * contact data is exposed (the number that matters for an
    * erasure/GDPR sweep).
    */
  def propsAudit(spark: SparkSession, dir: String): DataFrame = {
    val raw = concat(col("props"),
      when(col("event_id") % 13 === 0,
        concat(lit(" user"), col("user_id"), lit("@mail.test")))
        .otherwise(lit("")))
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        hits(raw, TextOps.EmailRx).as("n_email"))
      .groupBy(col("event_type")).agg(
        count(lit(1)).as("n_events"),
        sum(when(col("n_email") > 0, 1L).otherwise(0L)).as("n_with_contact"),
        countDistinct(when(col("n_email") > 0, col("user_id")))
          .as("n_users_exposed"))
      .orderBy(col("event_type"))
  }

  /** Redacted-copy writer (q348): the actual scrubbing pass — every
    * planted PII span replaced by a typed placeholder (fixed email →
    * phone → ip order so engines can't disagree on overlaps), the
    * clean corpus WRITTEN to parquet, and the returned manifest read
    * back FROM THE WRITTEN COPY: per source, docs, redaction count,
    * clean character mass, and min/max content md5 — so the oracle's
    * hash check certifies the bytes that landed on disk, not just the
    * plan. The temp sink is released after the result is consumed
    * (Caches contract); a production run points `outDir` at object
    * storage and keeps it.
    */
  def redactedCopy(spark: SparkSession, dir: String,
      outDir: Option[String] = None): DataFrame = {
    val out = outDir.getOrElse(graft.Caches.trackTempDir(
      java.nio.file.Files.createTempDirectory("graft_pii_copy_"))
      .toString + "/clean")
    val clean = cleanCol
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        (hits(plantedRaw, TextOps.EmailRx) + hits(plantedRaw, TextOps.PhoneRx)
          + hits(plantedRaw, TextOps.IpRx)).as("n_redactions"),
        clean.as("clean"))
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_redactions")).as("n_redactions"),
        sum(length(col("clean")).cast("long")).as("n_chars_clean"),
        min(md5(col("clean").cast("binary"))).as("content_md5_min"),
        max(md5(col("clean").cast("binary"))).as("content_md5_max"))
      .orderBy(col("source"))
  }
}
