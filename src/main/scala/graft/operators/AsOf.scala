package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of (point-in-time) join — an operator Spark lacks natively.
  * Implemented by composition (preference (a) of the custom-operator
  * ladder): union both sides tagged, one window pass carries the latest
  * right-side match forward. One shuffle + one sort on (key, time) — no
  * range cross-join blowup, scales linearly with input.
  */
object AsOf {

  /** For each event, the most recent order of that user with
    * o_orderdate <= ts. Orders are first deduplicated per (custkey, day)
    * keeping the max orderkey, making ties deterministic.
    */
  def eventsAsOfOrders(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))

    val left = Tables.events(spark, dir)
      .select(col("user_id").as("key"), col("ts").as("at"),
        lit(1).as("side"), col("event_id"), lit(null).cast("long").as("o_orderkey"))
    val right = orders
      .select(col("o_custkey").as("key"),
        col("o_orderdate").cast("timestamp_ntz").as("at"),
        lit(0).as("side"), lit(null).cast("long").as("event_id"),
        col("o_orderkey"))

    // right rows sort before left rows at equal timestamps => <= semantics
    val w = Window.partitionBy(col("key")).orderBy(col("at"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.unionByName(right)
      .withColumn("matched",
        last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("key").as("user_id"),
        col("matched").as("o_orderkey"))
      .orderBy(col("event_id"))
  }
}
