package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Gap-based sessionization — the batch analogue of the reference's
  * cron-driven micro-batching (SURVEY.md §2.11): lag + cumulative sum,
  * two windows over the same (user_id, ts) partitioning so Spark reuses
  * one sort/exchange for both.
  */
object Sessionize {

  /** Sessions = runs of events per user with < 30 min between
    * consecutive events. Emits one row per session with exact counts.
    */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event_id"),
        max(col("event_id")).as("last_event_id"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }
}
