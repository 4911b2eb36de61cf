package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Single-relation as-of with a horizon — the LINEAR form every
    * attribution-style query should reach for (r9 verdict: lift q214's
    * conditional-running-max trick into a reusable operator so the
    * self-join-free plan is the default, with the join form as its
    * oracle).
    *
    * For every row of `events`, `asof_src_ts` is the timestamp of the
    * most recent STRICTLY-EARLIER row (ties broken by `tieCol` — a
    * source at the exact same (ts, tie) position does not match
    * itself) satisfying `isSource`, carried per `keyCol` by a running
    * conditional MAX over the time-ordered preceding frame: the max of
    * source timestamps IS the latest one because the frame is
    * time-ordered — no IGNORE NULLS dependency, which engines spell
    * differently. Rows satisfying `isTarget` are returned with
    * `asof_matched` = 1 when the source lies within `horizonSeconds`.
    *
    * 100 TB shape: ONE (key)-partitioned window over the event scan —
    * linear, no event×event range join (the q21 union-tag form is the
    * two-relation sibling; this is the self-join-free single-relation
    * case). The classic join formulation (`target ⋈ source ON key AND
    * src.ts < tgt.ts AND tgt.ts − src.ts ≤ h` + argmax) is the oracle
    * Wave5Spec checks this operator against.
    */
  def asOfAttribution(events: DataFrame, isSource: Column,
      isTarget: Column, horizonSeconds: Long,
      keyCol: String = "user_id", tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("asof_src_ts", max(when(isSource, col(tsCol))).over(w))
      .filter(isTarget)
      .withColumn("asof_matched",
        when(col("asof_src_ts").isNotNull &&
          col(tsCol) <= col("asof_src_ts") +
            expr(s"INTERVAL $horizonSeconds SECOND"),
          1L).otherwise(0L))
  }
}
