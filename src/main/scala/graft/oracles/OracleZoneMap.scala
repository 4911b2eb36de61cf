package graft.oracles

/** DuckDB oracles for zone-map skipping + Z-order clustering
  * (q439–q441). All integer arithmetic (ranks, integer div, Morton
  * bit-weight join); CTE prefix `zm` is unique to this family.
  */
object OracleZoneMap {

  /** Shared CTE block: the orders projection, the 16-row bit-weight
    * table, both layouts' file assignments and zone maps, the fixed
    * 8-predicate workload, and the per-layout audits. Mirrors
    * `ZoneMap` expression-for-expression.
    */
  private[oracles] val Common =
    "WITH zmo AS (SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS " +
      "o_custkey FROM orders), " +
      "zmn AS (SELECT COUNT(*) AS n FROM zmo), " +
      "zmb AS (SELECT i, (1::BIGINT << i) AS p2, " +
      "(1::BIGINT << (2*i)) AS p4 FROM range(0,16) t(i)), " +
      "zmlf AS (SELECT o_orderkey, o_custkey, " +
      "(ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) // 256 AS file_id " +
      "FROM zmo), " +
      "zmlz AS (SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
      "MIN(o_orderkey) AS min_ok, MAX(o_orderkey) AS max_ok, " +
      "MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck " +
      "FROM zmlf GROUP BY file_id), " +
      "zmmx AS (SELECT MAX(o_orderkey) AS max_ok, MAX(o_custkey) AS " +
      "max_ck FROM zmo), " +
      "zmpd AS (SELECT c.pred_col || '_' || CAST(k.i AS VARCHAR) AS " +
      "pred_id, c.pred_col, " +
      "((2*k.i+1) * (CASE WHEN c.pred_col='o_orderkey' THEN m.max_ok " +
      "ELSE m.max_ck END)) // 8 AS lo, " +
      "((2*k.i+1) * (CASE WHEN c.pred_col='o_orderkey' THEN m.max_ok " +
      "ELSE m.max_ck END)) // 8 + (CASE WHEN c.pred_col='o_orderkey' " +
      "THEN m.max_ok ELSE m.max_ck END) // 16 AS hi " +
      "FROM (VALUES ('o_orderkey'),('o_custkey')) c(pred_col), " +
      "range(0,4) k(i), zmmx m), " +
      "zmla AS (SELECT p.pred_id, CAST(COUNT(*) AS BIGINT) AS " +
      "files_total, " +
      "CAST(SUM(CASE WHEN (CASE WHEN p.pred_col='o_orderkey' THEN " +
      "z.max_ok ELSE z.max_ck END) >= p.lo AND (CASE WHEN " +
      "p.pred_col='o_orderkey' THEN z.min_ok ELSE z.min_ck END) <= " +
      "p.hi THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned, " +
      "CAST(SUM(CASE WHEN (CASE WHEN p.pred_col='o_orderkey' THEN " +
      "z.max_ok ELSE z.max_ck END) >= p.lo AND (CASE WHEN " +
      "p.pred_col='o_orderkey' THEN z.min_ok ELSE z.min_ck END) <= " +
      "p.hi THEN z.n_rows ELSE 0 END) AS BIGINT) AS rows_scanned " +
      "FROM zmlz z, zmpd p GROUP BY p.pred_id), " +
      "zmmt AS (SELECT p.pred_id, CAST(COUNT(*) AS BIGINT) AS " +
      "rows_matched FROM zmo o, zmpd p " +
      "WHERE (CASE WHEN p.pred_col='o_orderkey' THEN o.o_orderkey " +
      "ELSE o.o_custkey END) BETWEEN p.lo AND p.hi " +
      "GROUP BY p.pred_id), " +
      "zmrk AS (SELECT o_orderkey, o_custkey, " +
      "((ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) * 65536) // " +
      "(SELECT n FROM zmn) AS xb, " +
      "((ROW_NUMBER() OVER (ORDER BY o_custkey, o_orderkey) - 1) * " +
      "65536) // (SELECT n FROM zmn) AS yb FROM zmo), " +
      "zmzv AS (SELECT r.o_orderkey, r.o_custkey, " +
      "CAST(SUM(((r.xb // b.p2) % 2) * b.p4 + ((r.yb // b.p2) % 2) * " +
      "2 * b.p4) AS BIGINT) AS zval " +
      "FROM zmrk r, zmb b GROUP BY r.o_orderkey, r.o_custkey, r.xb, " +
      "r.yb), " +
      "zmzf AS (SELECT o_orderkey, o_custkey, " +
      "(ROW_NUMBER() OVER (ORDER BY zval, o_orderkey) - 1) // 256 AS " +
      "file_id FROM zmzv), " +
      "zmzz AS (SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
      "MIN(o_orderkey) AS min_ok, MAX(o_orderkey) AS max_ok, " +
      "MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck " +
      "FROM zmzf GROUP BY file_id), " +
      "zmza AS (SELECT p.pred_id, CAST(COUNT(*) AS BIGINT) AS " +
      "files_total, " +
      "CAST(SUM(CASE WHEN (CASE WHEN p.pred_col='o_orderkey' THEN " +
      "z.max_ok ELSE z.max_ck END) >= p.lo AND (CASE WHEN " +
      "p.pred_col='o_orderkey' THEN z.min_ok ELSE z.min_ck END) <= " +
      "p.hi THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned, " +
      "CAST(SUM(CASE WHEN (CASE WHEN p.pred_col='o_orderkey' THEN " +
      "z.max_ok ELSE z.max_ck END) >= p.lo AND (CASE WHEN " +
      "p.pred_col='o_orderkey' THEN z.min_ok ELSE z.min_ck END) <= " +
      "p.hi THEN z.n_rows ELSE 0 END) AS BIGINT) AS rows_scanned " +
      "FROM zmzz z, zmpd p GROUP BY p.pred_id), " +
      "zmcf AS (SELECT o_orderkey, o_custkey, " +
      "(ROW_NUMBER() OVER (ORDER BY o_custkey, o_orderkey) - 1) // " +
      "256 AS file_id FROM zmo), " +
      "zmcz AS (SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
      "MIN(o_orderkey) AS min_ok, MAX(o_orderkey) AS max_ok, " +
      "MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck " +
      "FROM zmcf GROUP BY file_id), " +
      "zmca AS (SELECT p.pred_id, " +
      "CAST(SUM(CASE WHEN (CASE WHEN p.pred_col='o_orderkey' THEN " +
      "z.max_ok ELSE z.max_ck END) >= p.lo AND (CASE WHEN " +
      "p.pred_col='o_orderkey' THEN z.min_ok ELSE z.min_ck END) <= " +
      "p.hi THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned, " +
      "CAST(SUM(CASE WHEN (CASE WHEN p.pred_col='o_orderkey' THEN " +
      "z.max_ok ELSE z.max_ck END) >= p.lo AND (CASE WHEN " +
      "p.pred_col='o_orderkey' THEN z.min_ok ELSE z.min_ck END) <= " +
      "p.hi THEN z.n_rows ELSE 0 END) AS BIGINT) AS rows_scanned " +
      "FROM zmcz z, zmpd p GROUP BY p.pred_id), " +
      "zms AS (SELECT (MAX(o_orderkey) + 3) // 3 AS step FROM zmo), " +
      "zmbr AS (SELECT o_orderkey, o_custkey, " +
      "(o_orderkey // (SELECT step FROM zms)) * 1000000 + " +
      "(ROW_NUMBER() OVER (PARTITION BY o_orderkey // " +
      "(SELECT step FROM zms) ORDER BY o_orderkey) - 1) // 256 AS " +
      "file_id FROM zmo), " +
      "zmbz AS (SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
      "MIN(o_orderkey) AS min_ok, MAX(o_orderkey) AS max_ok, " +
      "MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck " +
      "FROM zmbr GROUP BY file_id) "

  /** OPTIMIZE-side CTEs (q487–q488): live rows (the %37 DVs folded),
    * ranks recomputed within the retained set, Morton interleave, and
    * the rewritten files' zone maps. Appends to [[Common]]'s WITH.
    */
  private[oracles] val OptLive =
    ", zolv AS (SELECT o_orderkey, o_custkey FROM zmo " +
      "WHERE o_orderkey % 37 <> 0), " +
      "zoln AS (SELECT COUNT(*) AS n FROM zolv), " +
      "zork AS (SELECT o_orderkey, o_custkey, " +
      "((ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) * 65536) // " +
      "(SELECT n FROM zoln) AS xb, " +
      "((ROW_NUMBER() OVER (ORDER BY o_custkey, o_orderkey) - 1) * " +
      "65536) // (SELECT n FROM zoln) AS yb FROM zolv), " +
      "zozv AS (SELECT r.o_orderkey, r.o_custkey, " +
      "CAST(SUM(((r.xb // b.p2) % 2) * b.p4 + ((r.yb // b.p2) % 2) * " +
      "2 * b.p4) AS BIGINT) AS zval " +
      "FROM zork r, zmb b GROUP BY r.o_orderkey, r.o_custkey, r.xb, " +
      "r.yb), " +
      "zovf AS (SELECT o_orderkey, o_custkey, " +
      "(ROW_NUMBER() OVER (ORDER BY zval, o_orderkey) - 1) // 256 AS " +
      "file_id FROM zozv), " +
      "zovz AS (SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
      "MIN(o_orderkey) AS min_ok, MAX(o_orderkey) AS max_ok, " +
      "MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck " +
      "FROM zovf GROUP BY file_id) "

  /** Stale-layout CTEs (q476/q491): the batch 0-1 prefix Z-ordered
    * within itself, the batch-2 tail appended linear, zones + audit.
    * Appends to [[Common]]'s WITH.
    */
  private[oracles] val StaleCtes =
        ", zmsa2 AS (SELECT * FROM zmo WHERE o_orderkey < 2 * " +
        "(SELECT step FROM zms)), " +
        "zmsb2 AS (SELECT * FROM zmo WHERE o_orderkey >= 2 * " +
        "(SELECT step FROM zms)), " +
        "zmna2 AS (SELECT COUNT(*) AS n FROM zmsa2), " +
        "zmar2 AS (SELECT o_orderkey, o_custkey, " +
        "((ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) * 65536) // " +
        "(SELECT n FROM zmna2) AS xb, " +
        "((ROW_NUMBER() OVER (ORDER BY o_custkey, o_orderkey) - 1) * " +
        "65536) // (SELECT n FROM zmna2) AS yb FROM zmsa2), " +
        "zmaz2 AS (SELECT r.o_orderkey, r.o_custkey, " +
        "CAST(SUM(((r.xb // b.p2) % 2) * b.p4 + ((r.yb // b.p2) % 2) " +
        "* 2 * b.p4) AS BIGINT) AS zval FROM zmar2 r, zmb b " +
        "GROUP BY 1, 2, r.xb, r.yb), " +
        "zmstf AS (SELECT o_orderkey, o_custkey, " +
        "(ROW_NUMBER() OVER (ORDER BY zval, o_orderkey) - 1) // 256 " +
        "AS file_id FROM zmaz2 " +
        "UNION ALL SELECT o_orderkey, o_custkey, 5000000 + " +
        "(ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) // 256 " +
        "FROM zmsb2), " +
        "zmstz AS (SELECT file_id, CAST(COUNT(*) AS BIGINT) AS " +
        "n_rows, MIN(o_orderkey) AS min_ok, MAX(o_orderkey) AS " +
        "max_ok, MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck " +
        "FROM zmstf GROUP BY file_id), " +
        "zmsta AS (SELECT p.pred_id, " +
        "CAST(SUM(CASE WHEN (CASE WHEN p.pred_col='o_orderkey' THEN " +
        "z.max_ok ELSE z.max_ck END) >= p.lo AND (CASE WHEN " +
        "p.pred_col='o_orderkey' THEN z.min_ok ELSE z.min_ck END) <= " +
        "p.hi THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned, " +
        "CAST(SUM(CASE WHEN (CASE WHEN p.pred_col='o_orderkey' THEN " +
        "z.max_ok ELSE z.max_ck END) >= p.lo AND (CASE WHEN " +
        "p.pred_col='o_orderkey' THEN z.min_ok ELSE z.min_ck END) <= " +
        "p.hi THEN z.n_rows ELSE 0 END) AS BIGINT) AS rows_scanned " +
        "FROM zmstz z, zmpd p GROUP BY p.pred_id) "

  /** Incremental-recluster CTEs (q491): the tail Z-ordered within
    * itself (ranks over the tail only), unioned with the untouched
    * prefix files; zones + audit. Appends to [[StaleCtes]]'s WITH.
    */
  private[oracles] val IncrCtes =
    ", zitn AS (SELECT COUNT(*) AS n FROM zmsb2), " +
      "zitr AS (SELECT o_orderkey, o_custkey, " +
      "((ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) * 65536) // " +
      "(SELECT n FROM zitn) AS xb, " +
      "((ROW_NUMBER() OVER (ORDER BY o_custkey, o_orderkey) - 1) * " +
      "65536) // (SELECT n FROM zitn) AS yb FROM zmsb2), " +
      "zitz AS (SELECT r.o_orderkey, r.o_custkey, " +
      "CAST(SUM(((r.xb // b.p2) % 2) * b.p4 + ((r.yb // b.p2) % 2) * " +
      "2 * b.p4) AS BIGINT) AS zval " +
      "FROM zitr r, zmb b GROUP BY r.o_orderkey, r.o_custkey, r.xb, " +
      "r.yb), " +
      "zitf AS (SELECT o_orderkey, o_custkey, " +
      "(ROW_NUMBER() OVER (ORDER BY zval, o_orderkey) - 1) // 256 AS " +
      "file_id FROM zmaz2 " +
      "UNION ALL SELECT o_orderkey, o_custkey, 7000000 + " +
      "(ROW_NUMBER() OVER (ORDER BY zval, o_orderkey) - 1) // 256 " +
      "FROM zitz), " +
      "zicz AS (SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
      "MIN(o_orderkey) AS min_ok, MAX(o_orderkey) AS max_ok, " +
      "MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck " +
      "FROM zitf GROUP BY file_id), " +
      "zica AS (SELECT p.pred_id, " +
      "CAST(SUM(CASE WHEN (CASE WHEN p.pred_col='o_orderkey' THEN " +
      "z.max_ok ELSE z.max_ck END) >= p.lo AND (CASE WHEN " +
      "p.pred_col='o_orderkey' THEN z.min_ok ELSE z.min_ck END) <= " +
      "p.hi THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned, " +
      "CAST(SUM(CASE WHEN (CASE WHEN p.pred_col='o_orderkey' THEN " +
      "z.max_ok ELSE z.max_ck END) >= p.lo AND (CASE WHEN " +
      "p.pred_col='o_orderkey' THEN z.min_ok ELSE z.min_ck END) <= " +
      "p.hi THEN z.n_rows ELSE 0 END) AS BIGINT) AS rows_scanned " +
      "FROM zicz z, zmpd p GROUP BY p.pred_id) "

  val sql: Map[String, String] = Map(
    // q439: the per-file zone-map relation under the linear layout
    "q439_zonemap_stats" ->
      (Common +
        "SELECT file_id, n_rows, min_ok, max_ok, min_ck, max_ck " +
        "FROM zmlz ORDER BY file_id"),
    // q440: skip audit of the linear layout against the workload
    "q440_zonemap_skip_audit" ->
      (Common +
        "SELECT a.pred_id, p.pred_col, p.lo, p.hi, a.files_total, " +
        "a.files_scanned, a.rows_scanned, " +
        "COALESCE(m.rows_matched, 0) AS rows_matched " +
        "FROM zmla a JOIN zmpd p ON a.pred_id = p.pred_id " +
        "LEFT JOIN zmmt m ON a.pred_id = m.pred_id " +
        "ORDER BY a.pred_id"),
    // q441: linear vs Z-order, one row per predicate
    "q441_zorder_skip_audit" ->
      (Common +
        "SELECT l.pred_id, l.files_total, " +
        "l.files_scanned AS files_scanned_linear, " +
        "z.files_scanned AS files_scanned_zorder, " +
        "l.rows_scanned AS rows_scanned_linear, " +
        "z.rows_scanned AS rows_scanned_zorder, " +
        "COALESCE(m.rows_matched, 0) AS rows_matched " +
        "FROM zmla l JOIN zmza z ON l.pred_id = z.pred_id " +
        "LEFT JOIN zmmt m ON l.pred_id = m.pred_id " +
        "ORDER BY l.pred_id"),
    // q447: per-batch append manifest of the maintained artifact
    "q447_zonemap_incremental" ->
      (Common +
        "SELECT batch_id, n_files_added, n_rows_added, " +
        "CAST(SUM(n_files_added) OVER (ORDER BY batch_id) AS BIGINT) " +
        "AS total_files_after FROM (" +
        "SELECT file_id // 1000000 AS batch_id, " +
        "CAST(COUNT(*) AS BIGINT) AS n_files_added, " +
        "CAST(SUM(n_rows) AS BIGINT) AS n_rows_added " +
        "FROM zmbz GROUP BY 1) ORDER BY batch_id"),
    // q448: the zone-map artifact after all three appends
    "q448_zonemap_batched_stats" ->
      (Common +
        "SELECT file_id, n_rows, min_ok, max_ok, min_ck, max_ck " +
        "FROM zmbz ORDER BY file_id"),
    // q461: the small-file compaction work list (prefix-sum packing
    // into 512-row bins over the batch tails)
    "q461_compaction_plan" ->
      (Common +
        ", zmsf AS (SELECT file_id, n_rows, " +
        "(SUM(n_rows) OVER (ORDER BY file_id) - 1) // 512 AS group_id " +
        "FROM zmbz WHERE n_rows < 256), " +
        "zmgt AS (SELECT group_id, CAST(SUM(n_rows) AS BIGINT) AS " +
        "group_total FROM zmsf GROUP BY group_id) " +
        "SELECT s.file_id, s.n_rows, CAST(s.group_id AS BIGINT) AS " +
        "group_id, g.group_total FROM zmsf s JOIN zmgt g " +
        "ON s.group_id = g.group_id ORDER BY s.file_id"),
    // q462: post-compaction zone maps — full files unchanged, pack
    // groups merged to min/min–max/max
    "q462_compaction_zonemap" ->
      (Common +
        ", zmsf AS (SELECT file_id, n_rows, min_ok, max_ok, min_ck, " +
        "max_ck, (SUM(n_rows) OVER (ORDER BY file_id) - 1) // 512 AS " +
        "group_id FROM zmbz WHERE n_rows < 256) " +
        "SELECT * FROM (" +
        "SELECT file_id AS out_file, n_rows, min_ok, max_ok, min_ck, " +
        "max_ck, FALSE AS compacted FROM zmbz WHERE n_rows >= 256 " +
        "UNION ALL SELECT CAST(group_id + 1000000000 AS BIGINT), " +
        "CAST(SUM(n_rows) AS BIGINT), MIN(min_ok), MAX(max_ok), " +
        "MIN(min_ck), MAX(max_ck), TRUE FROM zmsf GROUP BY group_id) " +
        "ORDER BY out_file"),
    // q476: fresh vs stale vs no clustering — the OPTIMIZE-cadence
    // number (stale = prefix z-ordered with ranks within batches 0–1,
    // batch 2 appended linear)
    "q476_zorder_staleness" ->
      (Common + StaleCtes +
        "SELECT * FROM (" +
        "SELECT 'fresh_zorder' AS layout, CAST(SUM(files_scanned) AS " +
        "BIGINT) AS files_scanned_total, CAST(SUM(rows_scanned) AS " +
        "BIGINT) AS rows_scanned_total FROM zmza " +
        "UNION ALL SELECT 'stale_zorder', CAST(SUM(files_scanned) AS " +
        "BIGINT), CAST(SUM(rows_scanned) AS BIGINT) FROM zmsta " +
        "UNION ALL SELECT 'linear', CAST(SUM(files_scanned) AS " +
        "BIGINT), CAST(SUM(rows_scanned) AS BIGINT) FROM zmla) " +
        "ORDER BY layout"),
    // q449: the advisor — every candidate layout audited against the
    // same workload; recommend the argmin by rows scanned
    "q449_cluster_key_advisor" ->
      (Common +
        "SELECT layout, files_scanned_total, rows_scanned_total, " +
        "rows_scanned_total = MIN(rows_scanned_total) OVER () AS " +
        "recommended FROM (" +
        "SELECT 'sort_orderkey' AS layout, " +
        "CAST(SUM(files_scanned) AS BIGINT) AS files_scanned_total, " +
        "CAST(SUM(rows_scanned) AS BIGINT) AS rows_scanned_total " +
        "FROM zmla " +
        "UNION ALL SELECT 'sort_custkey', " +
        "CAST(SUM(files_scanned) AS BIGINT), " +
        "CAST(SUM(rows_scanned) AS BIGINT) FROM zmca " +
        "UNION ALL SELECT 'zorder', " +
        "CAST(SUM(files_scanned) AS BIGINT), " +
        "CAST(SUM(rows_scanned) AS BIGINT) FROM zmza) " +
        "ORDER BY layout"),
    // q487: the OPTIMIZE before/after audit — before = batch-appended
    // files carrying the %37 DVs (zmbz), after = live rows Z-ordered
    // (zone maps recomputed over the retained set, same workload)
    "q487_optimize_audit" ->
      (Common + OptLive +
        "SELECT * FROM (" +
        "SELECT 'after' AS side, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zovz) AS files_total, " +
        "(SELECT CAST(SUM(n_rows) AS BIGINT) FROM zovz) AS rows_stored, " +
        "0::BIGINT AS dv_rows, " +
        "(SELECT CAST(SUM(CASE WHEN (CASE WHEN p.pred_col = " +
        "'o_orderkey' THEN z.max_ok ELSE z.max_ck END) >= p.lo AND " +
        "(CASE WHEN p.pred_col = 'o_orderkey' THEN z.min_ok ELSE " +
        "z.min_ck END) <= p.hi THEN 1 ELSE 0 END) AS BIGINT) " +
        "FROM zovz z, zmpd p) AS files_scanned_total, " +
        "(SELECT CAST(SUM(CASE WHEN (CASE WHEN p.pred_col = " +
        "'o_orderkey' THEN z.max_ok ELSE z.max_ck END) >= p.lo AND " +
        "(CASE WHEN p.pred_col = 'o_orderkey' THEN z.min_ok ELSE " +
        "z.min_ck END) <= p.hi THEN z.n_rows ELSE 0 END) AS BIGINT) " +
        "FROM zovz z, zmpd p) AS rows_scanned_total " +
        "UNION ALL SELECT 'before', " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zmbz), " +
        "(SELECT CAST(SUM(n_rows) AS BIGINT) FROM zmbz), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zmo WHERE " +
        "o_orderkey % 37 = 0), " +
        "(SELECT CAST(SUM(CASE WHEN (CASE WHEN p.pred_col = " +
        "'o_orderkey' THEN z.max_ok ELSE z.max_ck END) >= p.lo AND " +
        "(CASE WHEN p.pred_col = 'o_orderkey' THEN z.min_ok ELSE " +
        "z.min_ck END) <= p.hi THEN 1 ELSE 0 END) AS BIGINT) " +
        "FROM zmbz z, zmpd p), " +
        "(SELECT CAST(SUM(CASE WHEN (CASE WHEN p.pred_col = " +
        "'o_orderkey' THEN z.max_ok ELSE z.max_ck END) >= p.lo AND " +
        "(CASE WHEN p.pred_col = 'o_orderkey' THEN z.min_ok ELSE " +
        "z.min_ck END) <= p.hi THEN z.n_rows ELSE 0 END) AS BIGINT) " +
        "FROM zmbz z, zmpd p)) " +
        "ORDER BY side"),
    // q488: the rewritten zone-map artifact (live rows, Z-ordered)
    "q488_optimize_zonemap" ->
      (Common + OptLive +
        "SELECT file_id, n_rows, min_ok, max_ok, min_ck, max_ck " +
        "FROM zovz ORDER BY file_id"),
    // q491: incremental re-cluster decision table — fresh vs
    // tail-only vs stale, each with its rewrite bill
    "q491_incremental_recluster" ->
      (Common + StaleCtes + IncrCtes +
        "SELECT * FROM (" +
        "SELECT 'fresh_zorder' AS layout, " +
        "CAST(SUM(files_scanned) AS BIGINT) AS files_scanned_total, " +
        "CAST(SUM(rows_scanned) AS BIGINT) AS rows_scanned_total, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zmo) AS rows_rewritten " +
        "FROM zmza " +
        "UNION ALL SELECT 'incremental', " +
        "CAST(SUM(files_scanned) AS BIGINT), " +
        "CAST(SUM(rows_scanned) AS BIGINT), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zmsb2) FROM zica " +
        "UNION ALL SELECT 'stale_zorder', " +
        "CAST(SUM(files_scanned) AS BIGINT), " +
        "CAST(SUM(rows_scanned) AS BIGINT), 0::BIGINT FROM zmsta) " +
        "ORDER BY layout"))
}
