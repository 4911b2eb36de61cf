package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Retraction}

/** Retraction algebra (q410–q411): a full retraction empties the
  * view (zero-count groups leave), and the delta merge is exact
  * against recomputation.
  */
class RetractionSpec extends SparkSpec {

  test("full negative delta empties the cell view (zero groups drop)") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val base = Analytics.pricingStatOf(li)
    val neg = base.select(col("l_returnflag"), col("l_linestatus"),
      (-col("sq")).as("sq"), (-col("sbp")).as("sbp"),
      (-col("sdp")).as("sdp"), (-col("sc")).as("sc"),
      (-col("n")).as("n"))
    val after = Analytics.pricingMerge(base.unionByName(neg))
      .filter(col("n") > 0)
    assert(after.count() === 0L)
    Caches.releaseAll(spark)
  }

  test("retraction reaches lineitem through a broadcast join only") {
    // the BUILD pipeline's plan (the stored-view read that q410 now
    // serves is joinless by construction)
    val p = preparedPlan(
      Retraction.retractablePricingCompute(spark, sfDir)).toString
    // the erased order set is tiny — a sort-merge join here would be
    // the 100 TB scale-killer this family exists to avoid
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    Caches.releaseAll(spark)
  }

  test("delta merge equals recomputation over retained rows") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val retained = li.join(
      graft.sources.Tables.orders(spark, sfDir)
        .filter(col("o_custkey") % 97 === 0).select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_anti")
    val recomputed = Analytics.pricingFinish(
      Analytics.pricingStatOf(retained)).collect().toSeq
    val delta = Retraction.retractablePricing(spark, sfDir)
      .collect().toSeq
    assert(delta == recomputed)
    Caches.releaseAll(spark)
  }
}
