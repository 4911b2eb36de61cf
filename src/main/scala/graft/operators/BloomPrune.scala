package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.BloomRuntime

import graft.sources.Tables

/** Bloom-filter-pruned semi-join — the runtime-filter technique that
  * keeps a 100 TB probe side off the shuffle. The build side (filtered
  * orders) is aggregated into a bloom filter whose bytes are held on
  * the driver like a model (same shape as the IVF centroid table);
  * the probe scan then drops non-candidate rows ROW-LOCALLY, before
  * any exchange, and the exact semi-join that follows touches only
  * survivors (clearing bloom false positives — membership has no
  * false negatives, so the result is bit-identical to the plain
  * semi-join the oracle runs). Spark's AQE plants the same expression
  * pair when its thresholds fire; holding the filter explicitly makes
  * the prune deterministic and reusable across stages and queries.
  */
object BloomPrune {

  /** Revenue per return flag over lineitems of high-value orders, with
    * the lineitem scan bloom-pruned on `l_orderkey` before the exact
    * semi-join.
    */
  def bloomPrunedRevenue(spark: SparkSession, dir: String,
      minTotal: Double = 400000.0): DataFrame = {
    val hot = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > minTotal)
      .select(col("o_orderkey"))
    // driver-side sizing + build, exactly what df.stat.bloomFilter does;
    // the build side is the small filtered dim, never the fact table
    val expected = math.max(hot.count(), 1L)
    val bloom = hot
      .agg(BloomRuntime.bloomFilterAgg(col("o_orderkey"), expected))
      .head().getAs[Array[Byte]](0)
    val pruned = Tables.lineitem(spark, dir)
      .filter(BloomRuntime.mightContain(bloom, col("l_orderkey")))
    pruned
      .join(hot, pruned("l_orderkey") === hot("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  /** The same query without the bloom prune — the equivalence baseline
    * for tests.
    */
  def plainRevenue(spark: SparkSession, dir: String,
      minTotal: Double = 400000.0): DataFrame = {
    val hot = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > minTotal)
      .select(col("o_orderkey"))
    val li = Tables.lineitem(spark, dir)
    li.join(hot, li("l_orderkey") === hot("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  /** Count of probe rows surviving the bloom alone (no exact join) —
    * exposed for the no-false-negative / pruning-effectiveness tests.
    */
  def bloomSurvivorCount(spark: SparkSession, dir: String,
      minTotal: Double = 400000.0): Long = {
    val hot = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > minTotal)
      .select(col("o_orderkey"))
    val expected = math.max(hot.count(), 1L)
    val bloom = hot
      .agg(BloomRuntime.bloomFilterAgg(col("o_orderkey"), expected))
      .head().getAs[Array[Byte]](0)
    Tables.lineitem(spark, dir)
      .filter(BloomRuntime.mightContain(bloom, col("l_orderkey")))
      .count()
  }
}
