package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{SlotFoldAggregator, SlotFoldInput}
import graft.sources.Tables

/** Queries exercised through the engine's other API surfaces: the DSv2
  * custom source, the typed Aggregator, `spark.sql` text queries
  * (GROUPING SETS), and range-frame windows.
  */
object SqlSurface {

  /** Custom DSv2 feed source with keyset pushdown: the `id > lastId`
    * predicate reaches `FeedScanBuilder.pushFilters`, so partitions are
    * planned only over the unread tail — watermark resumption without
    * scanning history.
    */
  def customFeedScan(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .format("graft.sources.feed.FeedTableProvider")
      .option("rows", "100000")
      .option("parts", "8")
      .load()
      .filter(col("id") > 98000)
      .groupBy(col("category"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
      .orderBy(col("category"))

  /** Typed-Aggregator slot fold over per-event tokens (A4/X2 through
    * the Dataset API).
    */
  def slotFoldAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(
        col("user_id"),
        col("event_id").as("seq"),
        array(col("event_type"),
          floor(col("value")).cast("long").cast("string")).as("toks"))
      .as[SlotFoldInput]
    ev.groupByKey(_.user_id)
      .agg(SlotFoldAggregator.toColumn.name("folded"))
      .map { case (u, r) => (u, r.slots, r.overflow) }
      .toDF("user_id", "slots", "overflow")
      .orderBy(col("user_id"))
  }

  /** GROUPING SETS through the SQL text surface (`spark.sql`). */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("day", to_date(col("ts")).cast("string"))
      .createOrReplaceTempView("events_v")
    spark.sql(
      """SELECT event_type, day, COUNT(*) AS n,
        |  CAST(GROUPING(event_type) AS BIGINT) AS g_type,
        |  CAST(GROUPING(day) AS BIGINT) AS g_day
        |FROM events_v
        |GROUP BY GROUPING SETS ((event_type), (day), ())
        |ORDER BY g_type, g_day, event_type ASC NULLS FIRST, day ASC NULLS FIRST
        |""".stripMargin)
  }

  /** Range-frame window: per-user sum of values over the trailing
    * event-id range [current-100, current] — a RANGE frame, not ROWS.
    */
  def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rangeBetween(-100, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        sum(col("value").cast("decimal(18,2)")).over(w)
          .cast("double").as("trailing_value"),
        count(lit(1)).over(w).as("trailing_n"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** E3's mixed-case ingest normalization (`server.js:141-156`): the
    * upstream feed mixes PascalCase/snake_case keys; one declarative
    * rename-and-default layer canonicalizes at the boundary.
    */
  def mixedCaseNormalize(spark: SparkSession, dir: String): DataFrame = {
    // simulate the messy upstream: mixed-case names, missing values
    val upstream = Tables.events(spark, dir)
      .select(
        col("event_id").as("EventId"),
        col("user_id").as("UserID"),
        col("event_type").as("event_type"),
        when(col("value") > 100, col("value")).as("TotalPrice"))
    val renames = Map(
      "EventId" -> "event_id", "UserID" -> "user_id",
      "event_type" -> "event_type", "TotalPrice" -> "total_price")
    val canonical = renames.foldLeft(upstream) {
      case (df, (from, to)) => df.withColumnRenamed(from, to)
    }
    canonical
      .na.fill(Map("total_price" -> 0.0))
      .orderBy(col("event_id"))
  }
}
