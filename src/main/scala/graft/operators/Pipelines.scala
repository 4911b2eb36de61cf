package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PhoneMerge, TextFunctions}
import graft.sources.Tables

/** E1 — the reference's flagship `run-etl` endpoint
  * (`src/controllers/contactpoint.controller.js:50-173`) as one Spark job
  * DAG (SURVEY.md §3-E1): watermark read → incremental filter → multi-
  * value extraction → per-key ordered merge fold → insert/update routing →
  * batch summary. Everything before the groupBy pipelines in one stage;
  * the only shuffles are the per-key fold and the routing join (broadcast
  * when the registry side is small).
  */
object Pipelines {

  def flagship(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)

    // 1. watermark (L1): one-row checkpoint-style read
    val wm = Incremental.watermark(ev)

    // 2. incremental batch beyond the watermark (F2), messy multi-value
    //    field synthesized from event attrs (plays groupContact's input)
    val batch = ev.filter(col("event_id") > wm)
      .withColumn("phones",
        TextFunctions.extractPhones(
          concat_ws(",", col("event_type"),
            floor(col("value")).cast("long").cast("string"),
            col("event_type"))))

    // 3. per-key ordered fold (A4): first occurrence of each phone per
    //    user in event order, then 10-slot split + overflow (X2 collapse)
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val folded = batch
      .withColumn("rn", row_number().over(w))
      .groupBy(col("user_id"))
      .agg(
        min(col("event_id")).as("first_event_id"),
        max(col("event_id")).as("max_event_id"),
        flatten(array_sort(collect_list(struct(col("rn"), col("phones")))).getField("phones"))
          .as("all_phones"))
      .withColumn("merged", TextFunctions.distinctOrdered(col("all_phones")))
      .withColumn("slots", PhoneMerge.slotsOf(col("merged")))
      .withColumn("note_other", PhoneMerge.overflowOf(col("merged")))

    // 4. insert/update routing (J1/J2) against the key registry
    val registry = broadcast(
      Tables.customer(spark, dir).select(col("c_custkey")))
    val routed = folded.join(registry,
      col("user_id") === col("c_custkey"), "left")

    // 5. batch summary (A3 + L3 log-finish shape)
    routed.agg(
      count(lit(1)).as("record_count"),
      sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("insert_count"),
      sum(when(col("c_custkey").isNotNull, 1L).otherwise(0L)).as("update_count"),
      // watermark must advance to the LAST processed id (the reference's
      // `newLastId = data[last].id`), not the max of per-user first ids —
      // resuming from the latter would re-process this batch's tail
      max(col("max_event_id")).as("new_last_id"),
      sum(size(col("slots")) - size(filter(col("slots"), x => x.isNull)))
        .as("phones_in_slots"))
  }

  /** K9 — the API response projection
    * (`contactpoint.controller.js:146-155`): per processed batch, the
    * JSON body the reference returns (`message`, `batch_no`, `count`,
    * `lastId`, `insertCount`, `updateCount`). Batches are keyset pages
    * (event_id div pageSize); insert-vs-update routing reuses the q04
    * semantics (unknown vs known user against the customer registry).
    * The body is built by string concatenation, not `to_json`, so the
    * bytes are engine-portable (the oracle concatenates identically) —
    * timing fields are the harness's job (L5), not the projection's.
    */
  def responseProjection(spark: SparkSession, dir: String,
      pageSize: Int = 1000): DataFrame = {
    val ev = Tables.events(spark, dir)
    val registry = broadcast(
      Tables.customer(spark, dir).select(col("c_custkey")))
    ev.join(registry, col("user_id") === col("c_custkey"), "left")
      .groupBy(floor(col("event_id") / pageSize).cast("long").as("batch_no"))
      .agg(
        count(lit(1)).as("count"),
        max(col("event_id")).as("last_id"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("insert_count"),
        sum(when(col("c_custkey").isNotNull, 1L).otherwise(0L)).as("update_count"))
      .select(col("batch_no"),
        concat(
          lit("{\"message\":\"Batch completed\",\"batch_no\":"), col("batch_no"),
          lit(",\"count\":"), col("count"),
          lit(",\"lastId\":"), col("last_id"),
          lit(",\"insertCount\":"), col("insert_count"),
          lit(",\"updateCount\":"), col("update_count"),
          lit("}")).as("response"))
      .orderBy(col("batch_no"))
  }
}
