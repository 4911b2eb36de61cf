package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.sources.Tables

/** User-scope erasure + retention (q404–q408, block 29): the
  * doc-scope erasure family (q386–q390) re-run on the surface the
  * reference actually deletes from — USER-keyed rows. The reference's
  * delete flow removes a contact's rows and wipes its derived cache
  * (/root/reference/src/controllers/contactpoint.controller.js:176-227,
  * /root/reference/src/services/preloadRedis.js:15-29); at GDPR scale
  * that request is "erase user X everywhere", which fans out through
  * the FK graph. Deterministic request: key % 97 == 0 (2 event users
  * and 16 customers on the sf0.01 fixture — non-vacuous at every SF).
  *
  * The executor drives the SAME tombstone-first machinery as the doc
  * family ([[Erasure.erase]] with keyCol = user_id): tombstones are
  * USER ids, so one tombstone row kills every event the user ever
  * produced — including events arriving AFTER the request (the
  * late-arrival case a user-keyed erasure must handle, spec-pinned).
  * Retention (q407) is the time-based sibling: a pure predicate
  * rewrite of the current version ([[Erasure.retire]]), idempotent by
  * construction, no tombstones (the policy IS the predicate).
  *
  * 100 TB shape: the cascade plan is one narrow scan per surface
  * (ids + group keys only; lineitem reaches the request through a
  * broadcast semi-join of the 16-customer order set); the executor
  * rewrites an event-grain registry (≤ #events rows — the q235
  * registry scale) and the tombstone side is #users, always
  * broadcastable.
  */
object UserErasure {

  private val UserMod = 97

  private def erasedUser(c: Column): Column = c % UserMod === 0

  /** Cascade erasure plan (q404): what "erase user-set U" touches,
    * per surface, walking the FK graph — customers themselves, their
    * orders, the order LINES (reached through the order set), and
    * their event rows with the contact-exposure count (the q347
    * plant: every 13th event carries the user's address).
    */
  def cascadePlan(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(erasedUser(col("c_custkey")))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("c_nationkey")).as("n_keys"))
      .select(lit("customer").as("surface"), col("n_rows"),
        col("n_keys"))
    val ordersOf = Tables.orders(spark, dir)
      .filter(erasedUser(col("o_custkey")))
    val orders = ordersOf
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("n_keys"))
      .select(lit("orders").as("surface"), col("n_rows"), col("n_keys"))
    val lines = Tables.lineitem(spark, dir)
      .join(broadcast(ordersOf.select(col("o_orderkey"))),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_keys"))
      .select(lit("lineitem").as("surface"), col("n_rows"),
        col("n_keys"))
    val events = Tables.events(spark, dir)
      .filter(erasedUser(col("user_id")))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_keys"))
      .select(lit("events").as("surface"), col("n_rows"), col("n_keys"))
    val exposed = Tables.events(spark, dir)
      .filter(erasedUser(col("user_id")) && col("event_id") % 13 === 0)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_keys"))
      .select(lit("contacts_exposed").as("surface"), col("n_rows"),
        col("n_keys"))
    cust.unionByName(orders).unionByName(lines).unionByName(events)
      .unionByName(exposed).orderBy(col("surface"))
  }

  private val evSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("ts", TimestampNTZType)))

  /** The events registry ledger: (event_id, user_id, event_type, ts)
    * maintained over the deterministic 3-batch event_id-range split,
    * every fold anti-joined against the USER tombstones, then the
    * erasure request executed ([[Erasure.erase]] on user_id) — built
    * ONCE per corpus as a shared [[LedgerArtifacts]] artifact (every
    * consumer is read-only). Returns (post-erasure state, ledger root).
    */
  private[streaming] def erasedEventsLedger(spark: SparkSession,
      dir: String): (DataFrame, String) = {
    val fp = LedgerArtifacts.fingerprint(
      Tables.events(spark, dir).select(col("event_id"), col("user_id")),
      Seq("event_id", "user_id"))
    val ledgerRoot = LedgerArtifacts.shared(spark,
      s"events_erased_${LedgerArtifacts.dirKey(dir)}", fp)(
      buildErasedEvents(spark, dir))
    val (_, _, path) = Provenance.committedVersions(spark, ledgerRoot)
      .last
    (spark.read.parquet(path), ledgerRoot)
  }

  /** The drain + erase into a caller-provided scratch root (the
    * [[LedgerArtifacts]] build contract).
    */
  private def buildErasedEvents(spark: SparkSession, dir: String)(
      root: String): Unit = {
    val streamDir = StreamingOps.idRangeSplitSource(spark,
      Tables.events(spark, dir).select(col("event_id").as("doc_id"),
        col("user_id"), col("event_type"), col("ts")), 3)
    val ledgerRoot = s"$root/state"
    val ledger =
      new StreamingOps.VersionedLedger(spark, ledgerRoot, Some(root))
    val stream = spark.readStream.schema(evSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir)
    val w = stream.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val ss = batch.sparkSession
        if (!ledger.isReplayed(id)) {
          val rows = Erasure.applyTombstones(ss, ledgerRoot,
            batch.select(col("doc_id").as("event_id"), col("user_id"),
              col("event_type"), col("ts")),
            keyCol = "user_id")
          val merged =
            if (ledger.isEmpty) rows
            else ss.read.parquet(ledger.path).unionByName(rows)
          ledger.write(merged, id)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
    StreamingOps.startWithCheckpoint(w, Some(root)).awaitTermination()
    Erasure.erase(spark, ledgerRoot,
      Tables.events(spark, dir).filter(erasedUser(col("user_id")))
        .select(col("user_id")).distinct(),
      keyCol = "user_id")
    ()
  }

  /** User erasure executor (q405): the events registry after the
    * request — per event type, surviving events and distinct users.
    */
  def userErasureExecute(spark: SparkSession, dir: String): DataFrame = {
    val (state, _) = erasedEventsLedger(spark, dir)
    state.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  /** Post-erasure certificate (q406): per event type, full-outer
    * across state / retained raw / erased raw — the q389 audit on the
    * user surface. The regulator's row: every erased user's events
    * are gone, everything else is conserved.
    */
  def userErasureCertificate(spark: SparkSession,
      dir: String): DataFrame = {
    val (state, _) = erasedEventsLedger(spark, dir)
    val st = state.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_state"))
    val raw = Tables.events(spark, dir).groupBy(col("event_type"))
      .agg(sum(when(erasedUser(col("user_id")), 0L).otherwise(1L))
        .as("n_retained"),
        sum(when(erasedUser(col("user_id")), 1L).otherwise(0L))
          .as("n_erased"))
    st.join(raw, Seq("event_type"), "full")
      .select(col("event_type"),
        coalesce(col("n_state"), lit(0L)).as("n_state"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_erased"), lit(0L)).as("n_erased"),
        (coalesce(col("n_state"), lit(0L)) ===
          coalesce(col("n_retained"), lit(0L))).as("conserved"))
      .orderBy(col("event_type"))
  }

  /** Retention rewrite (q407): the time-based policy — events before
    * the cutoff leave the state as a NEW version ([[Erasure.retire]]:
    * a pure predicate rewrite, idempotent, no tombstones). Per event
    * type: retained and purged mass — the table a storage-cost review
    * reads before committing a retention window.
    */
  def retentionRewrite(spark: SparkSession, dir: String,
      cutoff: String = "2024-01-16"): DataFrame = {
    val streamDir = StreamingOps.idRangeSplitSource(spark,
      Tables.events(spark, dir).select(col("event_id").as("doc_id"),
        col("user_id"), col("event_type"), col("ts")), 3)
    val root = graft.Caches.trackTempDir(
      Files.createTempDirectory("graft_retention_state_")).toString
    val ledgerRoot = s"$root/state"
    val ledger =
      new StreamingOps.VersionedLedger(spark, ledgerRoot, Some(root))
    val stream = spark.readStream.schema(evSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir)
    val w = stream.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val ss = batch.sparkSession
        if (!ledger.isReplayed(id)) {
          val rows = batch.select(col("doc_id").as("event_id"),
            col("user_id"), col("event_type"), col("ts"))
          val merged =
            if (ledger.isEmpty) rows
            else ss.read.parquet(ledger.path).unionByName(rows)
          ledger.write(merged, id)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
    StreamingOps.startWithCheckpoint(w, Some(root)).awaitTermination()
    Erasure.retire(spark, ledgerRoot,
      col("ts") >= lit(cutoff).cast("timestamp_ntz"))
    val (_, _, path) = Provenance.committedVersions(spark, ledgerRoot)
      .last
    val st = spark.read.parquet(path).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_retained"))
    val purged = Tables.events(spark, dir)
      .filter(col("ts") < lit(cutoff).cast("timestamp_ntz"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_purged"))
    st.join(purged, Seq("event_type"), "full")
      .select(col("event_type"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_purged"), lit(0L)).as("n_purged"))
      .orderBy(col("event_type"))
  }

  /** Cascade value mass (q408): what the cascade DELETES in value
    * terms — per erased customer: orders, exact decimal order value,
    * line count, and event count (events keyed by the same id
    * domain, the q07 enrichment convention). The one-page review a
    * deletion request of this size gets before execution.
    */
  def cascadeValueMass(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(erasedUser(col("c_custkey")))
      .select(col("c_custkey"))
    val orders = Tables.orders(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        // decimal-exact sum, double only at presentation (the house
        // money convention)
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("order_value"))
    val lines = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.orders(spark, dir)
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_lines"))
    val events = Tables.events(spark, dir)
      .filter(erasedUser(col("user_id")))
      .groupBy(col("user_id").as("o_custkey"))
      .agg(count(lit(1)).as("n_events"))
    broadcast(cust).select(col("c_custkey").as("o_custkey"))
      .join(orders, Seq("o_custkey"), "left")
      .join(lines, Seq("o_custkey"), "left")
      .join(events, Seq("o_custkey"), "left")
      .select(col("o_custkey").as("custkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("order_value"), lit(0.0)).as("order_value"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("custkey"))
  }
}
