package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The reference's incremental-batch ETL skeleton (SURVEY.md §2.5, §2.9,
  * §2.10) re-expressed declaratively. The `events` table plays the role of
  * the upstream contactpoint feed (`event_id` ≈ watermark id, `user_id` ≈
  * `hn_code`), `customer` plays the already-loaded key registry.
  */
object Incremental {

  /** A1/O1 — watermark read (`server.js:32-37`, `controller.js:9-14`):
    * MAX id over "successful" rows. 'purchase' stands in for
    * status='success'.
    */
  def watermarkLastId(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .agg(max(col("event_id")).as("last_id"))

  /** A2 — same-day batch counter (`controller.js:65-69`):
    * COALESCE(MAX(batch_no),0)+1 per day bucket.
    */
  def batchCounter(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).cast("string").as("day"))
      .agg((coalesce(max(floor(col("value")).cast("long")), lit(0L)) + 1)
        .as("next_batch"))
      .orderBy(col("day"))

  /** F2/L1 — resume from watermark: rows strictly beyond the last
    * successfully processed id (`fetchContact.js:6`, `preloadRedis.js:45`).
    * The watermark itself is a one-row driver-side read — the same shape
    * as a streaming checkpoint/offset read; the scan below it stays fully
    * distributed and the predicate is pushed into the parquet scan.
    */
  /** Shared one-row watermark read (checkpoint-style): MAX successful id
    * with a -1 empty sentinel. Single definition so the incremental,
    * replay, and flagship paths can never drift apart.
    */
  def watermark(events: DataFrame): Long =
    events.filter(col("event_type") === "signup")
      .agg(coalesce(max(col("event_id")), lit(-1L))).head().getLong(0)

  def incrementalBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val wm = watermark(ev)
    ev.filter(col("event_id") > wm)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
  }

  /** J1/J2/A3 — insert-vs-update routing (`saveToPostgres.js:193-242`):
    * one left join + conditional counts replaces the per-row
    * SISMEMBER probe. Single pass, map-side partial aggregation.
    */
  def insertUpdateSplit(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val keys = broadcast(Tables.customer(spark, dir).select(col("c_custkey")))
    ev.join(keys, col("user_id") === col("c_custkey"), "left")
      .agg(
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("inserts"),
        sum(when(col("c_custkey").isNotNull, 1L).otherwise(0L)).as("updates"),
        count(lit(1)).as("total"))
  }

  /** M1/M2/J4 — chunked DELETE becomes a complement filter over immutable
    * storage (`controller.js:176-227`): keep = NOT(predicate). No locks,
    * no chunking; the predicate pushes down to parquet row-group skipping.
    * Returns audit counts (exact decimal arithmetic for oracle parity).
    */
  def deleteComplement(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(!(col("l_returnflag") === "A" &&
        col("l_shipdate") >= lit("1995-01-01").cast("timestamp_ntz")))
      .agg(
        count(lit(1)).as("kept"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("kept_qty"))

  /** U4 — key-registry union (`saveToPostgres.js:249-252`): newly seen
    * keys merged into the existing registry, exact distinct union.
    */
  def keyRegistryUnion(spark: SparkSession, dir: String): DataFrame = {
    val newKeys = Tables.events(spark, dir)
      .select(col("user_id").cast("long").as("key"))
    val existing = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("key"))
    newKeys.union(existing).distinct().orderBy(col("key"))
  }

  /** Semi-structured extraction: the upstream feed's JSON payload
    * (`props`) parsed inline — the schema-on-read path the reference
    * does in JS object land (`server.js:141-156`). `from_json` with an
    * explicit one-field schema parses each document once with a typed
    * Jackson parser and lets Catalyst prune unrequested keys;
    * `get_json_object` here was ~50× the raw scan cost (7.3 s vs a
    * 0.14 s full-events scan at sf0.1) because it re-walks the document
    * text per extraction.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val propsSchema = StructType(Seq(StructField("k", LongType)))
    Tables.events(spark, dir)
      .select(col("event_id"),
        from_json(col("props"), propsSchema).getField("k").as("k"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("k_bucket"))
  }

  /** Corrupt-record quarantine routing — the bad-row contract every
    * at-scale ingest needs: rows whose semi-structured payload fails to
    * parse are counted into a quarantine bucket instead of failing the
    * job or silently vanishing. Corruption is synthesized
    * deterministically (every 7th event's JSON loses its closing
    * bytes — the test tables are clean by construction); `from_json`
    * yields null on a malformed document, so the valid/quarantined
    * split is a row-local null check and the whole audit is one
    * map-side-combined aggregation. In production the quarantined rows
    * themselves fork to a dead-letter sink via the same null predicate.
    */
  def quarantineRouting(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val propsSchema = StructType(Seq(StructField("k", LongType)))
    val raw = when(col("event_id") % 7 === 3,
        expr("substring(props, 1, length(props) - 2)"))
      .otherwise(col("props"))
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(raw, propsSchema).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_valid"),
        (count(lit(1)) - count(col("k"))).as("n_quarantined"),
        sum(col("k")).as("k_sum"))
      .orderBy(col("event_type"))
  }

  /** O2 — keyset pagination page: the reference's scan loop
    * (`preloadRedis.js:41-52`); one page = filter + sort + limit, which
    * Spark plans as TakeOrderedAndProject (no full sort).
    */
  def keysetPage(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_id") > 500)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
      .limit(100)

  /** A5 — first-occurrence-per-key (`saveToPostgres.js:224-230`): the row
    * that wins the single INSERT slot for its key.
    */
  def firstPerKey(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("first_event_id"),
        col("event_type").as("first_type"),
        to_date(col("ts")).cast("string").as("first_day"))
      .orderBy(col("user_id"))
  }
}
