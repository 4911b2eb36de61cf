package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The mutation/maintenance family (SURVEY.md §2.9) on immutable
  * storage: upsert = anti-join + append, update = column-replacing join,
  * replay = deterministic complement overwrite. All shapes the reference
  * does with ON CONFLICT / UPDATE / DELETE loops
  * (`saveToPostgres.js:315-409`, `server.js:89-92`).
  */
object Upsert {

  /** M4 — conflict-ignore upsert: existing rows win, new keys append.
    * One anti-join; appending a second time inserts zero rows
    * (idempotence is checked in tests).
    */
  def conflictIgnoreUpsert(spark: SparkSession, dir: String): DataFrame = {
    val target = Tables.customer(spark, dir)
      .select(col("c_custkey").as("key"), lit("existing").as("origin"))
    val source = Tables.events(spark, dir)
      .select(col("user_id").as("key")).distinct()
      .withColumn("origin", lit("inserted"))
    val inserts = source.join(target.select(col("key")), Seq("key"), "left_anti")
    target.unionByName(inserts).orderBy(col("key"), col("origin"))
  }

  /** K4 — bulk column-replacing update: per-key updates joined onto the
    * target, changed columns coalesced new-over-old. Replaces the
    * reference's chunked per-row UPDATE fan-out with one join-write.
    */
  def columnReplacingUpdate(spark: SparkSession, dir: String): DataFrame = {
    val updates = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("spend"))
    Tables.customer(spark, dir)
      .join(updates, col("c_custkey") === col("user_id"), "left")
      .select(
        col("c_custkey"),
        col("c_acctbal").as("old_acctbal"),
        coalesce(
          (col("c_acctbal").cast("decimal(18,2)") - col("spend")).cast("double"),
          col("c_acctbal")).as("new_acctbal"),
        when(col("spend").isNotNull, 1L).otherwise(0L).as("updated"))
      .orderBy(col("c_custkey"))
  }

  /** M3 — replay cleanup: wipe-beyond-watermark then re-insert makes
    * reprocessing idempotent. Expressed as the final state after a
    * replay: rows at-or-below the watermark keep their stored values,
    * rows beyond it take the (re-fetched) source values.
    */
  def replayBeyondWatermark(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val wm = Incremental.watermark(ev)
    val kept = ev.filter(col("event_id") <= wm)
      .select(col("event_id"), col("user_id"), lit("stored").as("state"))
    val replayed = ev.filter(col("event_id") > wm)
      .select(col("event_id"), col("user_id"), lit("replayed").as("state"))
    kept.unionByName(replayed).orderBy(col("event_id"))
  }

  /** L2/L3 — audit-log ledger row (`controller.js:15-48`): one batch
    * summary with counts and bounds; NOW() replaced by the batch's own
    * event-time bounds so the row is deterministic.
    */
  def batchLogFinish(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .agg(
        lit(1L).as("batch_no"),
        lit("success").as("status"),
        count(lit(1)).as("record_count"),
        min(col("event_id")).as("first_id"),
        max(col("event_id")).as("last_id"),
        to_date(min(col("ts"))).cast("string").as("started_day"),
        to_date(max(col("ts"))).cast("string").as("finished_day"))

  /** SCD2 history reconstruction: collapse each user's event-type
    * timeline into validity segments (type-2 slowly-changing-dimension
    * rows) — a change opens a segment, the next change closes it, the
    * open segment has no successor. Two windows over the same
    * (user_id, event_id) sort order, so Spark plans ONE shuffle + sort
    * and both windows ride it; the segment collapse is an ordinary
    * groupBy. This is the warehouse-side dual of the reference's
    * per-key UPDATE (K4): instead of overwriting state, history is
    * retained as intervals.
    */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val run = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val segs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byUser).isNull ||
          lag(col("event_type"), 1).over(byUser) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("seg", sum(col("chg")).over(run))
      .groupBy(col("user_id"), col("seg"))
      .agg(
        min(col("event_type")).as("event_type"), // constant within a run
        min(col("event_id")).as("valid_from_id"),
        count(lit(1)).as("n_events"))
    val bySeg = Window.partitionBy(col("user_id")).orderBy(col("seg"))
    segs
      .withColumn("valid_to_id", lead(col("valid_from_id"), 1).over(bySeg))
      .select(col("user_id"), col("seg"), col("event_type"),
        col("valid_from_id"), col("valid_to_id"), col("n_events"))
      .orderBy(col("user_id"), col("seg"))
  }

  /** E2 state rebuild (`preloadRedis.js:5-85`): the key registry and
    * keyed state snapshot derived in one pass — the two Redis structures
    * (SET + per-key HASH) as one keyed table.
    */
  def stateRebuild(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        max(col("event_id")).as("last_event_id"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy(col("user_id"))
}
