package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Zone-map data skipping + Z-order clustering (q439–q441, block 44).
  *
  * The missing half of the layout story (q416–q418 size files and
  * shuffles; nothing yet decides ROW ORDER): at 100 TB the difference
  * between a full scan and a 1% scan is per-file min/max metadata
  * ("zone maps" — what parquet row-group stats and Delta/Iceberg file
  * stats give a reader for free) combined with a row order that keeps
  * each file's min/max tight on EVERY predicate column at once. A
  * single-column sort gives perfect pruning on that column and none on
  * any other; interleaving the bits of both keys (Z-order, the
  * Morton curve) gives near-optimal pruning on each — the standard
  * multi-dimensional clustering trade (Delta OPTIMIZE ZORDER BY,
  * Iceberg sort orders).
  *
  * Fixture shape: `orders` is "written" as fixed-size files (256
  * rows/file — the sf-independent analogue of maxRecordsPerFile), the
  * zone maps are the per-file min/max of the two predicate columns,
  * and a fixed 8-predicate workload (4 range probes per column, bounds
  * derived from the column max by integer division so they scale with
  * sf) is audited against the zone maps: a file is scanned iff its
  * zone overlaps the predicate range. Everything is integer
  * arithmetic, so all three queries hash-oracle.
  *
  * 100 TB shape: the zone-map relation is metadata-sized (one row per
  * file — ~1M rows for 100 TB at 128 MB files), so the audit is a
  * broadcast-join of 8 predicates against metadata, never a data scan.
  * The exact global ranks used to normalize the two key distributions
  * before bit interleaving (a window at fixture scale, for oracle
  * determinism) become the equi-depth histogram lookup a production
  * writer uses (the q416 planner's per-source stats are exactly that
  * input); the Z-value itself is 16 integer ops per row, computed in
  * the write path's codegen'd projection.
  *
  * Reference anchor: the reference writes its contact rows in fetch
  * order and scans them back whole (`saveToPostgres.js:1-527` — no
  * layout decision at all); these queries are the layout decision a
  * 100 TB deployment cannot skip.
  */
object ZoneMap {

  /** Rows per simulated file — fixed so #files scales with data. */
  private[operators] val RowsPerFile = 256L

  /** Bits per dimension in the Z-value (16 → 32-bit Morton codes). */
  private val BitsPerDim = 16

  private[graft] def orders(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey").cast("long").as("o_custkey"))

  /** (i, p2 = 2^i, p4 = 4^i) for i in 0..15 — the bit-weight table the
    * interleave sum joins against (identical 16-row relation in the
    * oracle, so the Morton arithmetic is engine-portable without any
    * shift builtins).
    */
  private def bitWeights(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.tabulate(BitsPerDim)(i => (i, 1L << i, 1L << (2 * i)))
      .toDF("i", "p2", "p4")
  }

  /** Linear layout: files in o_orderkey order (the "insertion order"
    * a naive writer produces on this table).
    */
  private def linearFiles(o: DataFrame): DataFrame =
    o.withColumn("rn",
        row_number().over(Window.orderBy(col("o_orderkey"))).cast("long"))
      .withColumn("file_id", expr(s"(rn - 1L) div ${RowsPerFile}L"))
      .drop("rn")

  /** Z-order layout: each key is normalized to a 16-bit value by exact
    * global rank (`((rank-1) * 2^16) div n` — equi-depth, so skew in
    * either key cannot collapse the curve), the two 16-bit values are
    * bit-interleaved into a 32-bit Morton code via the bit-weight
    * join, and files are cut in Morton order.
    */
  private[graft] def zorderFiles(spark: SparkSession, o: DataFrame): DataFrame = {
    val n = o.count()
    val ranked = o
      .withColumn("rx",
        row_number().over(Window.orderBy(col("o_orderkey"))).cast("long"))
      .withColumn("ry",
        row_number().over(
          Window.orderBy(col("o_custkey"), col("o_orderkey"))).cast("long"))
      .withColumn("xb", expr(s"((rx - 1L) * 65536L) div ${n}L"))
      .withColumn("yb", expr(s"((ry - 1L) * 65536L) div ${n}L"))
    val z = ranked
      .crossJoin(broadcast(bitWeights(spark)))
      .groupBy(col("o_orderkey"), col("o_custkey"), col("xb"), col("yb"))
      .agg(sum(
        expr("((xb div p2) % 2L) * p4 + ((yb div p2) % 2L) * 2L * p4"))
        .as("zval"))
    z.withColumn("rn",
        row_number().over(
          Window.orderBy(col("zval"), col("o_orderkey"))).cast("long"))
      .withColumn("file_id", expr(s"(rn - 1L) div ${RowsPerFile}L"))
      .select(col("o_orderkey"), col("o_custkey"), col("file_id"))
  }

  /** Per-file zone maps: min/max of both predicate columns + count. */
  private[graft] def zones(filed: DataFrame): DataFrame =
    filed.groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("o_orderkey")).as("min_ok"),
        max(col("o_orderkey")).as("max_ok"),
        min(col("o_custkey")).as("min_ck"),
        max(col("o_custkey")).as("max_ck"))

  /** The fixed range-probe workload: per predicate column, 4 ranges
    * with bounds `lo_k = (2k+1)·max div 8`, `hi_k = lo_k + max div 16`
    * — sf-portable (derived from the column max by integer division)
    * and identical in the oracle.
    */
  private[graft] def predicates(spark: SparkSession, o: DataFrame): DataFrame = {
    import spark.implicits._
    val maxes = o.agg(max(col("o_orderkey")).as("max_ok"),
      max(col("o_custkey")).as("max_ck"))
    val frames = Seq("o_orderkey", "o_custkey")
      .flatMap(c => (0 until 4).map(k => (c, k.toLong)))
      .toDF("pred_col", "k")
    frames.crossJoin(broadcast(maxes))
      .withColumn("maxv",
        when(col("pred_col") === "o_orderkey", col("max_ok"))
          .otherwise(col("max_ck")))
      .select(
        concat(col("pred_col"), lit("_"), col("k")).as("pred_id"),
        col("pred_col"),
        expr("((2L * k + 1L) * maxv) div 8L").as("lo"),
        (expr("((2L * k + 1L) * maxv) div 8L") +
          expr("maxv div 16L")).as("hi"))
  }

  /** Zone-map audit of one layout: per predicate, how many files the
    * zone maps admit vs skip, and the row-level read amplification
    * (rows in scanned files vs rows actually matching).
    */
  private[operators] def audit(zonesDf: DataFrame, preds: DataFrame,
      o: DataFrame): DataFrame = {
    val hit = zonesDf.crossJoin(broadcast(preds))
      .withColumn("zmin",
        when(col("pred_col") === "o_orderkey", col("min_ok"))
          .otherwise(col("min_ck")))
      .withColumn("zmax",
        when(col("pred_col") === "o_orderkey", col("max_ok"))
          .otherwise(col("max_ck")))
      .withColumn("scanned",
        (col("zmax") >= col("lo") && col("zmin") <= col("hi"))
          .cast("long"))
      .groupBy(col("pred_id"))
      .agg(count(lit(1)).as("files_total"),
        sum(col("scanned")).as("files_scanned"),
        sum(col("scanned") * col("n_rows")).as("rows_scanned"))
    val matched = o.crossJoin(broadcast(preds))
      .withColumn("v",
        when(col("pred_col") === "o_orderkey", col("o_orderkey"))
          .otherwise(col("o_custkey")))
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .groupBy(col("pred_id"))
      .agg(count(lit(1)).as("rows_matched"))
    hit.join(matched, Seq("pred_id"), "left")
      .na.fill(0L, Seq("rows_matched"))
  }

  /** q439: the zone-map relation itself under the linear layout — the
    * per-file metadata a reader prunes on.
    */
  def zonemapStats(spark: SparkSession, dir: String): DataFrame =
    zones(linearFiles(orders(spark, dir))).orderBy(col("file_id"))

  /** q440: the skip audit under the linear (insertion-order) layout —
    * orderkey probes prune almost everything, custkey probes prune
    * nothing (every file spans the whole custkey range). The
    * quantified "why" behind clustering.
    */
  def zonemapSkipAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val preds = predicates(spark, o).persist()
    audit(zones(linearFiles(o)), preds, o)
      .join(preds.select(col("pred_id"), col("pred_col"), col("lo"),
        col("hi")), Seq("pred_id"))
      .select(col("pred_id"), col("pred_col"), col("lo"), col("hi"),
        col("files_total"), col("files_scanned"), col("rows_scanned"),
        col("rows_matched"))
      .orderBy(col("pred_id"))
  }

  /** Files cut in an arbitrary sort order (for the advisor's
    * candidate layouts).
    */
  private def sortedFiles(o: DataFrame, sortCols: Seq[Column]): DataFrame =
    o.withColumn("rn",
        row_number().over(Window.orderBy(sortCols: _*)).cast("long"))
      .withColumn("file_id", expr(s"(rn - 1L) div ${RowsPerFile}L"))
      .drop("rn")

  /** q449: the cluster-key advisor — evaluate the whole candidate
    * layout space (sort by orderkey, sort by custkey, Z-order both)
    * against the SAME predicate workload and recommend the argmin by
    * total rows scanned. Closes block 44's loop the way q437 closed
    * q409's: the layout decision is not a heuristic, it is the audit
    * run over every candidate — and at 100 TB the audit costs
    * metadata, so running it for 3 candidates is free relative to one
    * mislaid OPTIMIZE.
    */
  def clusterKeyAdvisor(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).persist()
    val preds = predicates(spark, o).persist()
    def total(layout: String, filed: DataFrame): DataFrame =
      audit(zones(filed), preds, o)
        .agg(sum(col("files_scanned")).as("files_scanned_total"),
          sum(col("rows_scanned")).as("rows_scanned_total"))
        .select(lit(layout).as("layout"), col("files_scanned_total"),
          col("rows_scanned_total"))
    val all = total("sort_orderkey", linearFiles(o))
      .unionByName(total("sort_custkey",
        sortedFiles(o, Seq(col("o_custkey"), col("o_orderkey")))))
      .unionByName(total("zorder", zorderFiles(spark, o)))
    val best = all.agg(min(col("rows_scanned_total")).as("best"))
    all.crossJoin(broadcast(best))
      .select(col("layout"), col("files_scanned_total"),
        col("rows_scanned_total"),
        (col("rows_scanned_total") === col("best")).as("recommended"))
      .orderBy(col("layout"))
  }

  // ---------------------------------------------------------------
  // incremental maintenance on append (q447–q448)
  // ---------------------------------------------------------------

  /** The deterministic 3-batch id-range split of orders (the batch
    * discipline the streaming ledgers use): batch b = keys in
    * `[b·ceil((max+1)/3), (b+1)·ceil((max+1)/3))`.
    */
  private def batched(o: DataFrame): DataFrame = {
    val step = o.agg(expr("(max(o_orderkey) + 3L) div 3L").as("step"))
    o.crossJoin(broadcast(step))
      .withColumn("batch_id", expr("o_orderkey div step"))
      .drop("step")
  }

  /** Per-batch file assignment: each append job cuts ITS OWN files
    * (file numbering restarts per batch under a batch prefix), which
    * is what a real writer does — an append never renumbers or
    * rewrites the files already on disk. That property is exactly why
    * zone-map maintenance is incremental: the artifact gains the new
    * batch's rows and nothing else changes.
    */
  private[operators] def batchFiles(o: DataFrame): DataFrame =
    batched(o)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("batch_id"))
          .orderBy(col("o_orderkey"))).cast("long"))
      .withColumn("file_id",
        expr(s"batch_id * 1000000L + (rn - 1L) div ${RowsPerFile}L"))
      .drop("rn")

  /** q447: the append manifest — one row per arriving batch with the
    * files/rows it added and the artifact size after. The incremental
    * cost ledger: each append computes zone maps for ITS files only
    * (O(batch)), never rescans the table (O(corpus)).
    */
  def zonemapIncremental(spark: SparkSession, dir: String): DataFrame = {
    val zs = zones(batchFiles(orders(spark, dir)))
      .withColumn("batch_id", expr("file_id div 1000000L"))
    zs.groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_files_added"),
        sum(col("n_rows")).as("n_rows_added"))
      .withColumn("total_files_after",
        sum(col("n_files_added")).over(
          Window.orderBy(col("batch_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("batch_id"))
  }

  /** q448: the maintained zone-map artifact itself after all three
    * appends — per-file stats keyed by the batch-prefixed file id.
    * ZoneMapSpec pins that maintaining it incrementally (per-batch
    * folds into a stored artifact) yields byte-identical rows.
    */
  def zonemapBatchedStats(spark: SparkSession, dir: String): DataFrame =
    zones(batchFiles(orders(spark, dir))).orderBy(col("file_id"))

  /** The incremental path q448's spec compares against: fold batches
    * one at a time into an accumulated artifact (each step sees ONLY
    * its batch's rows), returning the final artifact.
    */
  private[graft] def zonemapFoldIncrementally(spark: SparkSession,
      dir: String): DataFrame = {
    val all = batchFiles(orders(spark, dir)).persist()
    (0L to 2L).map(b => zones(all.filter(col("batch_id") === b)
        .drop("batch_id")))
      .reduce(_.unionByName(_))
  }

  /** Compaction bin target: small files pack into ≤512-row outputs.
    * Distinct from RowsPerFile on purpose — the write chunk and the
    * OPTIMIZE target are different knobs (tails of adjacent 256-row
    * write jobs must be able to merge).
    */
  private val CompactTarget = 512L

  /** Synthetic id space for compacted output files, disjoint from the
    * batch-prefixed input ids.
    */
  private val CompactIdBase = 1000000000L

  /** Small files (batch tails) with their pack assignment: files are
    * packed in file-id order by PREFIX-SUM bucketing — group =
    * `(inclusive_cumsum − 1) div target` — the relational, one-window
    * variant of greedy first-fit a distributed planner actually runs
    * (greedy is inherently sequential; the prefix-sum cut needs one
    * pass and is deterministic). Bound: a group holds at most
    * target + one straddling file (< 512 + 256 rows) — the standard
    * prefix-cut overshoot, accepted for scan-friendliness the same
    * way maxPartitionBytes is a soft cap.
    */
  private def smallFilePlan(spark: SparkSession, dir: String): DataFrame =
    zones(batchFiles(orders(spark, dir)))
      .filter(col("n_rows") < RowsPerFile)
      .withColumn("cum",
        sum(col("n_rows")).over(Window.orderBy(col("file_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("group_id", expr(s"(cum - 1L) div ${CompactTarget}L"))
      .drop("cum")

  /** q461: the compaction work list — every sub-chunk file, the output
    * group it packs into, and the group's total. The OPTIMIZE job's
    * input manifest: at 100 TB the small-file problem is millions of
    * append tails, and this table IS the job plan (metadata-sized, one
    * row per small file).
    */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val planned = smallFilePlan(spark, dir)
    val totals = planned.groupBy(col("group_id"))
      .agg(sum(col("n_rows")).as("group_total"))
    planned.join(totals, Seq("group_id"))
      .select(col("file_id"), col("n_rows"), col("group_id"),
        col("group_total"))
      .orderBy(col("file_id"))
  }

  /** q462: the zone-map artifact after compaction — untouched full
    * files keep their stats, each pack group becomes one output file
    * whose zones are the member min/min–max/max merge. Compaction is
    * a metadata rewrite for the zone maps: no corpus scan, the merged
    * stats derive from the artifact itself (the q447 maintenance
    * discipline again).
    */
  def compactionZonemap(spark: SparkSession, dir: String): DataFrame = {
    val all = zones(batchFiles(orders(spark, dir))).persist()
    val big = all.filter(col("n_rows") >= RowsPerFile)
      .select(col("file_id").as("out_file"), col("n_rows"),
        col("min_ok"), col("max_ok"), col("min_ck"), col("max_ck"),
        lit(false).as("compacted"))
    val merged = smallFilePlan(spark, dir)
      .groupBy(col("group_id"))
      .agg(sum(col("n_rows")).as("n_rows"),
        min(col("min_ok")).as("min_ok"),
        max(col("max_ok")).as("max_ok"),
        min(col("min_ck")).as("min_ck"),
        max(col("max_ck")).as("max_ck"))
      .select((col("group_id") + CompactIdBase).as("out_file"),
        col("n_rows"), col("min_ok"), col("max_ok"), col("min_ck"),
        col("max_ck"), lit(true).as("compacted"))
    big.unionByName(merged).orderBy(col("out_file"))
  }

  /** Split orders at the last-OPTIMIZE boundary: (the clustered
    * prefix = batches 0–1, the appended tail = batch 2).
    */
  private[graft] def prefixTail(o: DataFrame): (DataFrame, DataFrame) = {
    val step = o.agg(expr("(max(o_orderkey) + 3L) div 3L").as("step"))
    val withStep = o.crossJoin(broadcast(step))
    (withStep.filter(col("o_orderkey") < expr("2L * step"))
        .drop("step"),
      withStep.filter(col("o_orderkey") >= expr("2L * step"))
        .drop("step"))
  }

  /** The stale-cluster layout: batches 0–1 Z-ordered at the time the
    * last OPTIMIZE ran (ranks computed WITHIN that prefix — the only
    * data the job saw), batch 2 appended afterwards in arrival order
    * as new files. The state every periodically-clustered 100 TB
    * table lives in between OPTIMIZE runs.
    */
  private def staleZorderFiles(spark: SparkSession,
      o: DataFrame): DataFrame = {
    val (prefix, tail0) = prefixTail(o)
    val optimized = zorderFiles(spark, prefix)
    val tail = tail0
      .withColumn("rn",
        row_number().over(Window.orderBy(col("o_orderkey"))).cast("long"))
      .withColumn("file_id",
        expr(s"5000000L + (rn - 1L) div ${RowsPerFile}L"))
      .select(col("o_orderkey"), col("o_custkey"), col("file_id"))
    optimized.unionByName(tail)
  }

  /** The INCREMENTAL re-cluster's layout (q491): the clustered prefix
    * untouched, the appended tail Z-ordered within itself (ranks over
    * the tail only) into files under a distinct id space. What a
    * cadence-triggered OPTIMIZE actually rewrites: O(tail), not
    * O(table).
    */
  private def incrementalZorderFiles(spark: SparkSession,
      o: DataFrame): DataFrame = {
    val (prefix, tail) = prefixTail(o)
    zorderFiles(spark, prefix)
      .unionByName(zorderFiles(spark, tail)
        .withColumn("file_id", col("file_id") + 7000000L))
  }

  /** q491: the incremental-recluster decision table — the same
    * workload against the fresh full re-cluster, the incremental
    * tail-only one, and doing nothing (stale), WITH each option's
    * rewrite bill. The row the q476 cadence acts on: the incremental
    * job recovers most of the skip benefit for a fraction of the
    * rows rewritten — the reason table formats ship incremental
    * OPTIMIZE at all.
    */
  def incrementalReclusterAudit(spark: SparkSession,
      dir: String): DataFrame = {
    val o = orders(spark, dir).persist()
    val preds = predicates(spark, o).persist()
    val (_, tail) = prefixTail(o)
    val nAll = o.agg(count(lit(1)).as("rows_rewritten"))
    val nTail = tail.agg(count(lit(1)).as("rows_rewritten"))
    val zero = o.agg(lit(0L).as("rows_rewritten"))
    def total(layout: String, filed: DataFrame,
        rewritten: DataFrame): DataFrame =
      audit(zones(filed), preds, o)
        .agg(sum(col("files_scanned")).as("files_scanned_total"),
          sum(col("rows_scanned")).as("rows_scanned_total"))
        .crossJoin(rewritten)
        .select(lit(layout).as("layout"), col("files_scanned_total"),
          col("rows_scanned_total"), col("rows_rewritten"))
    total("fresh_zorder", zorderFiles(spark, o), nAll)
      .unionByName(total("incremental",
        incrementalZorderFiles(spark, o), nTail))
      .unionByName(total("stale_zorder", staleZorderFiles(spark, o),
        zero))
      .orderBy(col("layout"))
  }

  /** q476: the staleness audit — the same workload against the fresh
    * Z-order, the stale one (clustered prefix + linear append tail),
    * and no clustering at all. The middle row is the cost of NOT
    * re-running OPTIMIZE, i.e. the number a clustering cadence is
    * tuned against.
    */
  def zorderStalenessAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).persist()
    val preds = predicates(spark, o).persist()
    def total(layout: String, filed: DataFrame): DataFrame =
      audit(zones(filed), preds, o)
        .agg(sum(col("files_scanned")).as("files_scanned_total"),
          sum(col("rows_scanned")).as("rows_scanned_total"))
        .select(lit(layout).as("layout"), col("files_scanned_total"),
          col("rows_scanned_total"))
    total("fresh_zorder", zorderFiles(spark, o))
      .unionByName(total("stale_zorder", staleZorderFiles(spark, o)))
      .unionByName(total("linear", linearFiles(o)))
      .orderBy(col("layout"))
  }

  /** q441: linear vs Z-order, one row per predicate — the layout
    * decision as a table. Z-order trades a little orderkey pruning for
    * custkey pruning going from 0% to ~94% skipped; the sum of files
    * scanned across the whole workload drops.
    */
  def zorderSkipAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).persist()
    val preds = predicates(spark, o).persist()
    val lin = audit(zones(linearFiles(o)), preds, o)
      .select(col("pred_id"),
        col("files_total"),
        col("files_scanned").as("files_scanned_linear"),
        col("rows_scanned").as("rows_scanned_linear"))
    val zo = audit(zones(zorderFiles(spark, o)), preds, o)
      .select(col("pred_id"),
        col("files_scanned").as("files_scanned_zorder"),
        col("rows_scanned").as("rows_scanned_zorder"),
        col("rows_matched"))
    lin.join(zo, Seq("pred_id"))
      .select(col("pred_id"), col("files_total"),
        col("files_scanned_linear"), col("files_scanned_zorder"),
        col("rows_scanned_linear"), col("rows_scanned_zorder"),
        col("rows_matched"))
      .orderBy(col("pred_id"))
  }
}
