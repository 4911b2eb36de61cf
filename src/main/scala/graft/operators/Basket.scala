package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Market-basket affinity over orders (q381–q385): which part brands
  * are bought TOGETHER more than chance predicts — pair support,
  * lift, per-brand top affinities, and the basket-size distribution,
  * plus streaming twins riding one maintained (order, brand) state.
  *
  * 100 TB shape: everything collapses to the DISTINCT (order, brand)
  * grain first (≤ #orders × #brands rows, one shuffle); the pair
  * self-join is order-local and bounded by the brand-set size per
  * order (≤ #brands = 25 here, p99 basket = 8), so pair expansion is
  * O(orders · basket²), never corpus². Lift is exact integer
  * arithmetic (cooc · N and supp_a · supp_b are BIGINT products)
  * with ONE double division at the end — IEEE-identical cross-engine.
  * The streaming state is the same (order, brand) grain and
  * DISTINCT-merges (idempotent — an order's lines spanning
  * micro-batches still land one row per brand), so the batch SQL is
  * the oracle for any batching.
  */
object Basket {

  /** The shared grain: distinct (order, brand) — q384/q385's
    * mergeable state (merge = distinct).
    */
  private[graft] def orderBrands(spark: SparkSession, dir: String,
      li: DataFrame): DataFrame =
    li.select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(Tables.part(spark, dir)
          .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"))
      .distinct()

  /** Pair support + lift off the (order, brand) grain. */
  private[graft] def affinityOf(ob0: DataFrame): DataFrame = {
    // barrier: the grain feeds totals, marginals, and the pair join.
    // Cached PRE-PARTITIONED on the order key so the pair self-join
    // reuses the cached partitioning on both sides (zero extra
    // shuffle) — the co-located-join discipline that matters when the
    // grain is orders × brands at 100 TB.
    val ob = ob0.repartition(col("l_orderkey")).persist()
    graft.Caches.onRelease(() =>
      try ob.unpersist(false) catch { case _: Throwable => () })
    val totals = ob.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    val marg = ob.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_brand"))
    ob.as("a")
      .join(ob.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.p_brand") < col("b.p_brand"))
      .groupBy(col("a.p_brand").as("brand_a"),
        col("b.p_brand").as("brand_b"))
      .agg(count(lit(1)).as("n_cooc"))
      .join(broadcast(marg.select(col("p_brand").as("brand_a"),
        col("n_brand").as("n_a"))), Seq("brand_a"))
      .join(broadcast(marg.select(col("p_brand").as("brand_b"),
        col("n_brand").as("n_b"))), Seq("brand_b"))
      .crossJoin(broadcast(totals))
      .select(col("brand_a"), col("brand_b"), col("n_cooc"),
        col("n_a"), col("n_b"),
        ((col("n_cooc") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }

  /** The full-corpus affinity pair table as a STORED VIEW (the
    * maintained-view discipline the retraction family certifies):
    * built once per corpus under the fingerprint contract, read by
    * q381, q382, and the q430 certificate's full-corpus expectation.
    * Fingerprint covers the (order, part) incidence and the brand
    * dimension — the exact inputs of the grain.
    */
  private[graft] def affinityPairsStored(spark: SparkSession,
      dir: String): DataFrame = {
    import graft.streaming.LedgerArtifacts
    val fp = LedgerArtifacts.tableFingerprint(Seq(
      ("lineitem", Tables.lineitem(spark, dir),
        Seq("l_orderkey", "l_partkey")),
      ("part", Tables.part(spark, dir), Seq("p_partkey", "p_brand"))))
    LedgerArtifacts.sharedTable(spark,
      s"view_affinity_pairs_${LedgerArtifacts.dirKey(dir)}", fp) {
      affinityOf(orderBrands(spark, dir, Tables.lineitem(spark, dir)))
    }
  }

  /** Brand affinity table (q381): every co-ordered brand pair with
    * support counts and lift — served from the stored view.
    */
  def brandAffinity(spark: SparkSession, dir: String): DataFrame =
    affinityPairsStored(spark, dir)
      .orderBy(col("brand_a"), col("brand_b"))

  /** Top affinities per brand (q382): the symmetrized pair table
    * ranked by lift within each brand, top 3 — deterministic under
    * ties (partner name breaks them). Reads the stored view, so the
    * symmetrizing union's two arms are two cheap parquet reads
    * instead of two pair self-joins.
    */
  def topAffinities(spark: SparkSession, dir: String,
      k: Int = 3): DataFrame = {
    val pairs = affinityPairsStored(spark, dir)
    val sym = pairs.select(col("brand_a").as("brand"),
        col("brand_b").as("partner"), col("n_cooc"), col("lift"))
      .unionByName(pairs.select(col("brand_b").as("brand"),
        col("brand_a").as("partner"), col("n_cooc"), col("lift")))
    sym.withColumn("rank", row_number().over(
        Window.partitionBy(col("brand"))
          .orderBy(col("lift").desc, col("partner"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("brand"), col("partner"), col("n_cooc"), col("lift"),
        col("rank"))
      .orderBy(col("brand"), col("rank"))
  }

  /** Basket-size distribution (q383): distinct brands per order →
    * order-count histogram (≤ #brands rows).
    */
  def basketSizes(spark: SparkSession, dir: String): DataFrame =
    sizesOf(orderBrands(spark, dir, Tables.lineitem(spark, dir)))

  private[graft] def sizesOf(ob: DataFrame): DataFrame =
    ob.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_brands"))
      .groupBy(col("n_brands"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_brands"))
}
