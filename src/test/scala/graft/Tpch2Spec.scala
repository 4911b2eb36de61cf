package graft

import org.apache.spark.sql.functions._

import graft.operators.Analytics
import graft.sources.Tables

/** Block-22 TPC-H shapes (q365–q370): the mergeable-statistic
  * contracts behind the streaming twins, and the q365 pushdown
  * promise (its whole point is being the canonical filtered-scan row).
  */
class Tpch2Spec extends SparkSpec {

  test("forecast stat merges: two halves fold to the one-shot cell") {
    val li = Tables.lineitem(spark, sfDir)
    val whole = Analytics.forecastMerge(
      Analytics.forecastStatOf(li)).collect()(0)
    val halves = Analytics.forecastMerge(
      Analytics.forecastStatOf(li.filter(col("l_orderkey") % 2 === 0))
        .unionByName(
          Analytics.forecastStatOf(
            li.filter(col("l_orderkey") % 2 === 1)))).collect()(0)
    assert(whole == halves)
    Caches.releaseAll(spark)
  }

  test("volume stat merges across a split that severs orders mid-way") {
    val li = Tables.lineitem(spark, sfDir)
    // split by LINE number parity: most orders have lines on both
    // sides, the exact batch-spanning case q370 documents
    val whole = Analytics.volumeMerge(Analytics.volumeStatOf(li))
      .collect().map(r => (r.getLong(0), r.getDecimal(1))).toMap
    val halves = Analytics.volumeMerge(
      Analytics.volumeStatOf(li.filter(col("l_linenumber") % 2 === 0))
        .unionByName(Analytics.volumeStatOf(
          li.filter(col("l_linenumber") % 2 === 1))))
      .collect().map(r => (r.getLong(0), r.getDecimal(1))).toMap
    assert(whole == halves)
    Caches.releaseAll(spark)
  }

  test("q365 pushes every predicate to the parquet scan") {
    val plan = Analytics.forecastRevenue(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), plan.take(2000))
    val pushed = plan.linesIterator
      .find(_.contains("PushedFilters:")).get
    assert(pushed.contains("l_shipdate") && pushed.contains("l_quantity"),
      pushed)
    Caches.releaseAll(spark)
  }

  test("idle-balance threshold is exact: boundary customer stays out") {
    // cross-multiplied mean: a customer AT the mean must not qualify
    import spark.implicits._
    val cust = Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 15.0))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val posStat = cust.filter(col("c_acctbal") > 0)
      .agg(sum(col("c_acctbal").cast("decimal(12,2)")).as("sp"),
        count(lit(1)).as("np"))
    val qual = cust.crossJoin(broadcast(posStat))
      .filter(col("c_acctbal").cast("decimal(12,2)") * col("np") >
        col("sp"))
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    // mean = 15: only 20.0 is strictly above; 15.0 sits AT it
    assert(qual == Set(2L), qual.toString)
    Caches.releaseAll(spark)
  }
}
