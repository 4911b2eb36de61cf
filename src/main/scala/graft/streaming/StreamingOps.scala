package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Keyed state record for [[StreamingOps.statefulUserTotals]] — top-level
  * so the Catalyst encoder's generated code can reach its accessors.
  */
case class UserAgg(user_id: Long, n_events: Long, total_cents: Long)

/** Structured Streaming surface. The reference's "streaming" is cron-
  * driven micro-batching with an application watermark (SURVEY.md §2.11,
  * `controller.js:50-75`); here the same incremental semantics run as a
  * real stream: parquet file source → event-time windowed aggregation /
  * keyed state → sink. `Trigger.AvailableNow` drains the backlog exactly
  * once, which is the cron-batch contract.
  */
object StreamingOps {

  // raw parquet schema (ts read as nanos-since-epoch long, see Tables)
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val counter = new AtomicInteger(0)

  private def streamEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet") // file source needs a dir
      .parquet(dir)
      .withColumn("ts",
        expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
  }

  /** Event-time tumbling-window aggregation, complete mode into a memory
    * sink, drained with AvailableNow — the batch-equivalent result is
    * exactly GROUP BY date_trunc('hour', ts), which the oracle checks.
    */
  def hourlyWindowCounts(spark: SparkSession, dir: String): DataFrame = {
    val name = s"graft_hourly_${counter.incrementAndGet()}"
    val agg = streamEvents(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        col("window.start").cast("string").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy(col("window_start"), col("event_type"))
  }


  /** Keyed custom state via mapGroupsWithState: per-user running totals.
    * Cents-as-long state keeps the arithmetic exact so the oracle can
    * check it. With AvailableNow this is one pass of state updates — the
    * same shape a 24/7 pipeline runs incrementally.
    */
  def statefulUserTotals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val name = s"graft_state_${counter.incrementAndGet()}"
    val ds = streamEvents(spark, dir)
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long)]
    val updated = ds
      .groupByKey(_._1)
      .mapGroupsWithState[UserAgg, UserAgg](GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long)], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(key, 0L, 0L))
          var n = prev.n_events
          var cents = prev.total_cents
          rows.foreach { r => n += 1; cents += r._2 }
          val next = UserAgg(key, n, cents)
          state.update(next)
          next
      }
    val q = updated.toDF()
      .writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the memory table holds one snapshot per update; the FINAL state is
    // the snapshot with the highest n_events (monotone per key) — a
    // struct-max, NOT independent per-column maxes, which would be wrong
    // whenever total_cents is non-monotone (e.g. refunds)
    spark.table(name)
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("total_cents"))).as("last"))
      .select(col("user_id"),
        col("last.n_events").as("n_events"),
        col("last.total_cents").as("total_cents"))
      .orderBy(col("user_id"))
  }
}
