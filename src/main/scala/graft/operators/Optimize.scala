package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OPTIMIZE executor (q487–q488, block 67) — the r15 verdict's top
  * item: the layout layer AUDITS and RECOMMENDS (q449 cluster-key
  * advisor, q461 compaction plan, q476 staleness cadence, q478 DV
  * bar) but nothing EXECUTED a recommendation. This operator closes
  * the loop the way Delta/Iceberg ship it — OPTIMIZE as a job, not a
  * report:
  *
  *  1. input = the realistic pre-OPTIMIZE state of `orders`: the
  *     q447 batch-appended layout (batch-prefixed files with small
  *     append tails) carrying the %37 delete request as DELETION
  *     VECTORS (the q478 debt — deleted rows still stored, masked at
  *     read);
  *  2. the rewrite folds the DVs (deleted rows physically dropped),
  *     re-clusters the LIVE rows by the q449 advisor's argmin layout
  *     (Z-order over both predicate columns — `recommended = true` on
  *     this workload), and re-cuts uniform files, which also packs
  *     the q461 small-file tails (the three jobs one OPTIMIZE pass
  *     pays for once);
  *  3. the proof is the before/after audit against the SAME fixed
  *     8-predicate workload: `rows_scanned_total` must DROP and
  *     `dv_rows` must hit zero — the two numbers the advisor promised.
  *
  * q487 is that audit (one row per side); q488 the rewritten zone-map
  * artifact itself (what the table's file stats look like after the
  * job). OptimizeSpec writes the rewritten layout to real parquet,
  * reads it back, and pins that no DV'd key survived and that the
  * per-file min/max equal the q488 artifact — the DV-folding claim
  * checked against bytes, not algebra.
  *
  * Reference anchor: the reference rewrites nothing — its contact
  * rows live in fetch order forever (`saveToPostgres.js`); OPTIMIZE
  * is the operation a 100 TB table needs precisely because "write
  * order" and "read order" diverge at scale.
  *
  * 100 TB shape: the executor reads the LIVE rows of the files the
  * plans flag (merge-on-read scan: file scan + broadcast anti-join of
  * its DV), shuffles once on the Z-value to cut output files, and
  * commits by swapping file metadata (the q450 manifest-pointer
  * discipline). The audit costs metadata on both sides — per-file
  * stats joined to 8 predicates. The exact global ranks used here for
  * oracle determinism are the equi-depth histogram lookup in a
  * production writer (the q416 stats), exactly as in `ZoneMap`.
  */
object Optimize {

  /** The delete request carried as DVs in the pre-OPTIMIZE state. */
  private def deleted = col("o_orderkey") % 37 === 0

  /** The rewritten layout: live rows only, Z-ordered, uniform files.
    * The spec round-trips this through real parquet.
    */
  private[graft] def rewrittenFiles(spark: SparkSession,
      dir: String): DataFrame = {
    val live = ZoneMap.orders(spark, dir).filter(!deleted)
    ZoneMap.zorderFiles(spark, live)
  }

  /** One side's audit totals: file count, stored rows, DV debt, and
    * the workload scan totals from the zone maps.
    */
  private def sideTotals(side: String, zonesDf: DataFrame,
      preds: DataFrame, dvRows: DataFrame): DataFrame = {
    val totals = zonesDf.agg(count(lit(1)).as("files_total"),
      sum(col("n_rows")).as("rows_stored"))
    val scans = zonesDf.crossJoin(broadcast(preds))
      .withColumn("zmin",
        when(col("pred_col") === "o_orderkey", col("min_ok"))
          .otherwise(col("min_ck")))
      .withColumn("zmax",
        when(col("pred_col") === "o_orderkey", col("max_ok"))
          .otherwise(col("max_ck")))
      .withColumn("scanned",
        (col("zmax") >= col("lo") && col("zmin") <= col("hi"))
          .cast("long"))
      .agg(sum(col("scanned")).as("files_scanned_total"),
        sum(col("scanned") * col("n_rows")).as("rows_scanned_total"))
    totals.crossJoin(scans).crossJoin(dvRows)
      .select(lit(side).as("side"), col("files_total"),
        col("rows_stored"), col("dv_rows"),
        col("files_scanned_total"), col("rows_scanned_total"))
  }

  /** q487: the OPTIMIZE before/after audit — the batch-appended,
    * DV-carrying state vs the rewritten one, against the same
    * workload. `after` must store fewer rows (DVs folded), report
    * zero DV debt, and scan fewer rows — a rewrite that failed any of
    * the three breaks the oracle hash.
    */
  def optimizeAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = ZoneMap.orders(spark, dir).persist()
    val preds = ZoneMap.predicates(spark, o).persist()
    val beforeZones = ZoneMap.zones(
      ZoneMap.batchFiles(o).select(col("o_orderkey"), col("o_custkey"),
        col("file_id")))
    val afterZones = ZoneMap.zones(rewrittenFiles(spark, dir))
    val beforeDv = o.agg(
      coalesce(sum(when(deleted, 1L).otherwise(0L)), lit(0L))
        .as("dv_rows"))
    val afterDv = spark.range(1).select(lit(0L).as("dv_rows"))
    sideTotals("after", afterZones, preds, afterDv)
      .unionByName(sideTotals("before", beforeZones, preds, beforeDv))
      .orderBy(col("side"))
  }

  /** q488: the zone-map artifact after the rewrite — the per-file
    * stats a reader prunes on once OPTIMIZE lands. Tighter zones on
    * BOTH columns at once is the whole point; q487 quantifies it.
    */
  def optimizeZonemap(spark: SparkSession, dir: String): DataFrame =
    ZoneMap.zones(rewrittenFiles(spark, dir)).orderBy(col("file_id"))
}
