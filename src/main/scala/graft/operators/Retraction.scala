package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Derived-view retraction (q410–q411): erasure PROPAGATED INTO
  * MAINTAINED AGGREGATES without recomputing them from scratch — the
  * incremental-view-maintenance move that completes the erasure story
  * (q386–q390 rewrite state tables; a 24/7 deployment also holds
  * DERIVED views built from those tables, and re-deriving 100 TB per
  * takedown is not an option).
  *
  * Two retraction algebras, one query each:
  * - SUM-cell views retract by MERGING A NEGATIVE DELTA: the cells of
  *   the retracted rows, sign-flipped, folded through the same merge
  *   the streaming twins use (decimal addition is exact, so state +
  *   (−delta) is bit-identical to recomputing over the retained rows
  *   — which is exactly what the oracle does). Groups whose count
  *   reaches zero leave the view.
  * - DISTINCT-grain views can't subtract (a distinct row carries no
  *   multiplicity), so they retract by ANTI-JOIN against the
  *   retracted key set — the tombstone move on the state grain.
  *
  * The request is the q404 cascade: customers with
  * c_custkey % 97 == 0, reaching lineitem through their orders.
  *
  * 100 TB shape: the negative delta is one aggregate pass over ONLY
  * the retracted rows (reached via a broadcast semi-join of the
  * erased order set — never a corpus rescan); the distinct-grain
  * anti-join runs at state grain against a broadcast key set.
  */
object Retraction {

  private val Mod = 97

  /** The erased customers' order keys — always broadcastable. */
  private def erasedOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_custkey") % Mod === 0)
      .select(col("o_orderkey"))

  /** Retractable pricing summary (q410): the TPC-H Q1 cell view after
    * the cascade — state cells + sign-flipped cells of the retracted
    * lines, merged, zero-count groups dropped, finished with the
    * standard drain. The oracle recomputes Q1 over the retained rows;
    * hash equality IS the proof that the delta algebra is exact.
    */
  /** Combined fingerprint of the retraction views' inputs. */
  private def viewFingerprint(spark: SparkSession, dir: String,
      tag: String): String =
    tag + ":" + graft.streaming.LedgerArtifacts.tableFingerprint(Seq(
      ("lineitem", Tables.lineitem(spark, dir),
        Seq("l_orderkey", "l_partkey", "l_quantity")),
      ("orders", Tables.orders(spark, dir),
        Seq("o_orderkey", "o_custkey"))))

  /** The maintenance pipeline itself (the delta-merge plan the spec
    * pins: lineitem reached through a BROADCAST semi-join only).
    */
  private[graft] def retractablePricingCompute(spark: SparkSession,
      dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val base = Analytics.pricingStatOf(li)
    val retracted = Analytics.pricingStatOf(
      li.join(broadcast(erasedOrders(spark, dir)),
        col("l_orderkey") === col("o_orderkey"), "left_semi"))
    val neg = retracted.select(col("l_returnflag"),
      col("l_linestatus"),
      (-col("sq")).as("sq"), (-col("sbp")).as("sbp"),
      (-col("sdp")).as("sdp"), (-col("sc")).as("sc"),
      (-col("n")).as("n"))
    Analytics.pricingFinish(
      Analytics.pricingMerge(base.unionByName(neg))
        .filter(col("n") > 0))
  }

  def retractablePricing(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.LedgerArtifacts
    LedgerArtifacts.sharedTable(spark,
      s"view_pricing_retracted_${LedgerArtifacts.dirKey(dir)}",
      viewFingerprint(spark, dir, "pricing")) {
      retractablePricingCompute(spark, dir)
    }.orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Retractable brand affinity (q411): the q381/q384 DISTINCT
    * (order, brand) state after the cascade — retracted orders leave
    * the grain by anti-join (distinct states can't subtract), then
    * the same affinity drain. Oracle: the q381 chain over retained
    * orders.
    */
  def retractableAffinity(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.LedgerArtifacts
    LedgerArtifacts.sharedTable(spark,
      s"view_affinity_retracted_${LedgerArtifacts.dirKey(dir)}",
      viewFingerprint(spark, dir, "affinity")) {
      val ob = Basket.orderBrands(spark, dir,
        Tables.lineitem(spark, dir))
        .join(broadcast(erasedOrders(spark, dir)),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
      Basket.affinityOf(ob)
    }.orderBy(col("brand_a"), col("brand_b"))
  }
}
