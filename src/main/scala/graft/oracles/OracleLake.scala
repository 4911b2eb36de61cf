package graft.oracles

/** DuckDB oracles for the DSv2 lake provider (q507–q509). The table
  * the provider serves is the OPTIMIZE output (live rows, %37 folded,
  * Z-ordered into 256-row files), so the oracle re-derives the whole
  * layout from raw `orders` via [[OracleZoneMap.OptLive]]'s CTEs
  * (`zolv` = live rows, `zovf` = file assignment, `zovz` = zones) and
  * then recomputes zone admission — and, for q509, the bloom bitmap's
  * exact bit positions (`((key·a + b) % 1048573) % 4096`, k = 3) —
  * independently in SQL. A provider that planned one file too many or
  * too few, or a bloom that admitted or rejected one wrong probe,
  * breaks these hashes.
  */
object OracleLake {

  private val Hashes =
    "(VALUES (2654435761, 0), (2246822519, 7), (3266489917, 13)) h(a, b)"

  val sql: Map[String, String] = Map(
    // q507: the pruned aggregate through the provider — full-scan twin
    // over raw orders with the DVs folded
    "q507_lake_pruned_revenue" ->
      ("WITH lmx AS (SELECT MAX(CAST(o_custkey AS BIGINT)) AS max_ck " +
        "FROM orders), " +
        "lbd AS (SELECT (3 * max_ck) // 8 AS lo, " +
        "(3 * max_ck) // 8 + max_ck // 16 AS hi FROM lmx), " +
        "llv AS (SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS " +
        "o_custkey FROM orders WHERE o_orderkey % 37 <> 0) " +
        "SELECT o_custkey % 8 AS bucket, " +
        "CAST(COUNT(*) AS BIGINT) AS n_orders, " +
        "CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok " +
        "FROM llv, lbd WHERE o_custkey BETWEEN lo AND hi " +
        "GROUP BY bucket ORDER BY bucket"),
    // q508: per workload predicate, the files the provider must plan
    // (zone overlap on the rewritten layout) and the rows returned
    "q508_lake_plan_audit" ->
      (OracleZoneMap.Common + OracleZoneMap.OptLive +
        "SELECT p.pred_id, p.pred_col, p.lo, p.hi, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zovz) AS files_total, " +
        "CAST(SUM(CASE WHEN (CASE WHEN p.pred_col = 'o_orderkey' " +
        "THEN z.max_ok ELSE z.max_ck END) >= p.lo AND (CASE WHEN " +
        "p.pred_col = 'o_orderkey' THEN z.min_ok ELSE z.min_ck END) " +
        "<= p.hi THEN 1 ELSE 0 END) AS BIGINT) AS files_planned, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zolv v WHERE " +
        "(CASE WHEN p.pred_col = 'o_orderkey' THEN v.o_orderkey " +
        "ELSE v.o_custkey END) BETWEEN p.lo AND p.hi) AS n_rows " +
        "FROM zmpd p, zovz z " +
        "GROUP BY p.pred_id, p.pred_col, p.lo, p.hi " +
        "ORDER BY p.pred_id"),
    // q509: bloom point probes — zone admission vs zone+bloom
    // admission vs rows found, every bit recomputed from raw keys
    "q509_lake_bloom_probe" ->
      (OracleZoneMap.Common + OracleZoneMap.OptLive +
        ", lpr AS (SELECT CAST(j AS BIGINT) AS probe_id, " +
        "(j * (SELECT MAX(o_orderkey) FROM zmo)) // 9 AS probe_key " +
        "FROM range(1, 9) t(j)), " +
        s"lpp AS (SELECT DISTINCT p.probe_id, " +
        "((p.probe_key * h.a + h.b) % 1048573) % 4096 AS pos " +
        s"FROM lpr p, $Hashes), " +
        s"lfp AS (SELECT DISTINCT f.file_id, " +
        "((f.o_orderkey * h.a + h.b) % 1048573) % 4096 AS pos " +
        s"FROM zovf f, $Hashes), " +
        "lzf AS (SELECT p.probe_id, z.file_id FROM lpr p " +
        "JOIN zovz z ON p.probe_key BETWEEN z.min_ok AND z.max_ok), " +
        "lbf AS (SELECT zf.probe_id, zf.file_id FROM lzf zf WHERE " +
        "(SELECT COUNT(*) FROM lpp pp WHERE pp.probe_id = " +
        "zf.probe_id) = (SELECT COUNT(*) FROM lpp pp JOIN lfp fp ON " +
        "fp.pos = pp.pos WHERE pp.probe_id = zf.probe_id AND " +
        "fp.file_id = zf.file_id)) " +
        "SELECT p.probe_id, p.probe_key, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM lzf WHERE " +
        "lzf.probe_id = p.probe_id) AS files_zone, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM lbf WHERE " +
        "lbf.probe_id = p.probe_id) AS files_bloom, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zolv WHERE " +
        "o_orderkey = p.probe_key) AS n_rows " +
        "FROM lpr p ORDER BY p.probe_id"),
    // q521: the same 8 probes pushed as ONE IN filter — the provider
    // plans the UNION of per-key bloom-admitted files
    "q521_lake_in_probe" ->
      (OracleZoneMap.Common + OracleZoneMap.OptLive +
        ", lpr AS (SELECT CAST(j AS BIGINT) AS probe_id, " +
        "(j * (SELECT MAX(o_orderkey) FROM zmo)) // 9 AS probe_key " +
        "FROM range(1, 9) t(j)), " +
        s"lpp AS (SELECT DISTINCT p.probe_id, " +
        "((p.probe_key * h.a + h.b) % 1048573) % 4096 AS pos " +
        s"FROM lpr p, $Hashes), " +
        s"lfp AS (SELECT DISTINCT f.file_id, " +
        "((f.o_orderkey * h.a + h.b) % 1048573) % 4096 AS pos " +
        s"FROM zovf f, $Hashes), " +
        "lzf AS (SELECT p.probe_id, z.file_id FROM lpr p " +
        "JOIN zovz z ON p.probe_key BETWEEN z.min_ok AND z.max_ok), " +
        "lbf AS (SELECT zf.probe_id, zf.file_id FROM lzf zf WHERE " +
        "(SELECT COUNT(*) FROM lpp pp WHERE pp.probe_id = " +
        "zf.probe_id) = (SELECT COUNT(*) FROM lpp pp JOIN lfp fp ON " +
        "fp.pos = pp.pos WHERE pp.probe_id = zf.probe_id AND " +
        "fp.file_id = zf.file_id)) " +
        "SELECT 8::BIGINT AS n_probe_keys, " +
        "(SELECT CAST(COUNT(DISTINCT file_id) AS BIGINT) FROM lbf) " +
        "AS files_planned, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zovz) AS files_total, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zolv v JOIN lpr p ON " +
        "v.o_orderkey = p.probe_key) AS n_rows"),
    // q522: LIMIT pushdown — the provider plans only the file-id
    // prefix covering the limit
    "q522_lake_limit_audit" ->
      (OracleZoneMap.Common + OracleZoneMap.OptLive +
        ", llp AS (SELECT file_id, n_rows, " +
        "SUM(n_rows) OVER (ORDER BY file_id) - n_rows AS cum_before " +
        "FROM zovz), " +
        "lln AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total " +
        "FROM zovz), " +
        "llk AS (SELECT CAST(k AS BIGINT) AS lim FROM " +
        "(VALUES (100), (1000), (10000)) t(k)) " +
        "SELECT k.lim AS \"limit\", " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM llp p WHERE " +
        "p.cum_before < k.lim) AS files_planned, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zovz) AS files_total, " +
        "(SELECT CAST(LEAST(k.lim, total) AS BIGINT) FROM lln) AS " +
        "n_rows FROM llk k ORDER BY k.lim"),
    // q523: the documents instance pruned + projected — a doc_id
    // range probe per source, text decoded because it is asked for
    "q523_lake_docs_pruned" ->
      ("WITH lkm AS (SELECT MAX(doc_id) AS m FROM documents), " +
        "lkb AS (SELECT (3 * m) // 8 AS lo, " +
        "(3 * m) // 8 + m // 16 AS hi FROM lkm) " +
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars, " +
        "CAST(SUM(LENGTH(text)) AS BIGINT) AS n_text_chars " +
        "FROM documents, lkb WHERE doc_id BETWEEN lo AND hi " +
        "GROUP BY source ORDER BY source"),
    // q524: the documents plan audit — the id-sorted 512-row layout
    // prunes a doc_id range probe to the few overlapping files
    "q524_lake_docs_plan" ->
      ("WITH lkf AS (SELECT doc_id, " +
        "(ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // 512 AS file_id " +
        "FROM documents), " +
        "lkz AS (SELECT file_id, MIN(doc_id) AS min_id, " +
        "MAX(doc_id) AS max_id FROM lkf GROUP BY file_id), " +
        "lkm AS (SELECT MAX(doc_id) AS m FROM documents), " +
        "lkp AS (SELECT CAST(k AS BIGINT) AS pred_id, " +
        "((2 * k + 1) * m) // 8 AS lo, " +
        "((2 * k + 1) * m) // 8 + m // 16 AS hi " +
        "FROM range(0, 4) t(k), lkm) " +
        "SELECT p.pred_id, p.lo, p.hi, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM lkz) AS files_total, " +
        "CAST(SUM(CASE WHEN z.max_id >= p.lo AND z.min_id <= p.hi " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS files_planned, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE " +
        "doc_id BETWEEN p.lo AND p.hi) AS n_rows " +
        "FROM lkp p, lkz z GROUP BY p.pred_id, p.lo, p.hi " +
        "ORDER BY p.pred_id"),
    // q525: the append audit — snapshot v0 (order prefix, 256-row
    // z-order files), v1 = v0 + the tail's own files; history
    // immutable by construction of the append
    "q525_lake_append_audit" ->
      ("WITH lam AS (SELECT (MAX(o_orderkey) + 3) // 3 AS step, " +
        "CAST(COUNT(*) AS BIGINT) AS nall FROM orders), " +
        "lan AS (SELECT CAST((SELECT COUNT(*) FROM orders, lam " +
        "WHERE o_orderkey < 2 * step) AS BIGINT) AS n0, nall " +
        "FROM lam), " +
        "laf AS (SELECT n0, nall, (n0 + 255) // 256 AS f0, " +
        "(nall - n0 + 255) // 256 AS ft FROM lan) " +
        "SELECT * FROM (" +
        "SELECT 0::BIGINT AS version, f0 AS n_files, n0 AS n_rows, " +
        "f0 AS n_files_added, n0 AS n_rows_added, " +
        "TRUE AS history_immutable FROM laf " +
        "UNION ALL SELECT 1::BIGINT, f0 + ft, nall, ft, nall - n0, " +
        "TRUE FROM laf) ORDER BY version"),
    // q526: time travel through the provider — v0 answers WITHOUT
    // the appended rows, v1 still SHOWS the later-deleted rows (time
    // travel across the delete), latest (v2) masks the %37 DVs
    "q526_lake_asof_scan" ->
      ("WITH lam AS (SELECT (MAX(o_orderkey) + 3) // 3 AS step " +
        "FROM orders), " +
        "lag AS (SELECT " +
        "CAST(COUNT(*) AS BIGINT) AS nall, " +
        "CAST(SUM(o_orderkey) AS BIGINT) AS sall, " +
        "CAST(SUM(CASE WHEN o_orderkey % 37 <> 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS nlive, " +
        "CAST(SUM(CASE WHEN o_orderkey % 37 <> 0 THEN o_orderkey " +
        "ELSE 0 END) AS BIGINT) AS slive, " +
        "CAST(SUM(CASE WHEN o_orderkey < 2 * (SELECT step FROM lam) " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n0, " +
        "CAST(SUM(CASE WHEN o_orderkey < 2 * (SELECT step FROM lam) " +
        "THEN o_orderkey ELSE 0 END) AS BIGINT) AS s0 FROM orders) " +
        "SELECT * FROM (" +
        "SELECT 'latest' AS snapshot, nlive AS n_rows, slive AS " +
        "sum_ok FROM lag " +
        "UNION ALL SELECT 'v0', n0, s0 FROM lag " +
        "UNION ALL SELECT 'v1', nall, sall FROM lag) " +
        "ORDER BY snapshot"),
    // q527: the DV-delete audit — stored rows unchanged across the
    // delete (merge-on-read), masked counts and DV-carrying files
    // recomputed from the incremental layout
    "q527_lake_dv_audit" ->
      (OracleZoneMap.Common + OracleZoneMap.StaleCtes +
        OracleZoneMap.IncrCtes +
        ", ldn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nall, " +
        "CAST(SUM(CASE WHEN o_orderkey % 37 = 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS ndel FROM zmo), " +
        "ldf AS (SELECT CAST(COUNT(*) AS BIGINT) AS nfiles FROM zicz)" +
        ", ldd AS (SELECT CAST(COUNT(DISTINCT file_id) AS BIGINT) AS " +
        "nwithdv FROM zitf WHERE o_orderkey % 37 = 0) " +
        "SELECT * FROM (" +
        "SELECT 1::BIGINT AS version, f.nfiles AS n_files, " +
        "n.nall AS rows_stored, 0::BIGINT AS dv_rows, " +
        "n.nall AS rows_live, 0::BIGINT AS files_with_dv " +
        "FROM ldn n, ldf f " +
        "UNION ALL SELECT 2::BIGINT, f.nfiles, n.nall, n.ndel, " +
        "n.nall - n.ndel, d.nwithdv FROM ldn n, ldf f, ldd d) " +
        "ORDER BY version"),
    // q528: the pruned aggregate at the DV snapshot — live rows only;
    // q507's SQL verbatim (the MOR-masked inc table and the DV-folded
    // OPTIMIZE table must agree on the same live set)
    "q528_lake_dv_pruned_scan" ->
      ("WITH lmx AS (SELECT MAX(CAST(o_custkey AS BIGINT)) AS max_ck " +
        "FROM orders), " +
        "lbd AS (SELECT (3 * max_ck) // 8 AS lo, " +
        "(3 * max_ck) // 8 + max_ck // 16 AS hi FROM lmx), " +
        "llv AS (SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS " +
        "o_custkey FROM orders WHERE o_orderkey % 37 <> 0) " +
        "SELECT o_custkey % 8 AS bucket, " +
        "CAST(COUNT(*) AS BIGINT) AS n_orders, " +
        "CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok " +
        "FROM llv, lbd WHERE o_custkey BETWEEN lo AND hi " +
        "GROUP BY bucket ORDER BY bucket"),
    // q529: OPTIMIZE folds the DV debt — stored shrinks by exactly
    // the masked set, DVs zero, live mass conserved, fresh files
    "q529_lake_optimize_snapshot" ->
      ("WITH lam AS (SELECT (MAX(o_orderkey) + 3) // 3 AS step, " +
        "CAST(COUNT(*) AS BIGINT) AS nall, " +
        "CAST(SUM(CASE WHEN o_orderkey % 37 = 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS ndel FROM orders), " +
        "lan AS (SELECT nall, ndel, nall - ndel AS nlive, " +
        "CAST((SELECT COUNT(*) FROM orders, lam " +
        "WHERE o_orderkey < 2 * step) AS BIGINT) AS n0 FROM lam), " +
        "laf AS (SELECT nall, ndel, nlive, " +
        "(n0 + 255) // 256 + (nall - n0 + 255) // 256 AS f2, " +
        "(nlive + 255) // 256 AS f3 FROM lan) " +
        "SELECT * FROM (" +
        "SELECT 2::BIGINT AS version, f2 AS n_files, " +
        "nall AS rows_stored, ndel AS dv_rows, nlive AS rows_live " +
        "FROM laf " +
        "UNION ALL SELECT 3::BIGINT, f3, nlive, 0::BIGINT, nlive " +
        "FROM laf) ORDER BY version"),
    // q530: the probe answers identically across the fold; each
    // side's planned files come from its own layout's zones (v2 the
    // two-generation incremental layout, v3 the re-clustered one)
    "q530_lake_optimize_scan_parity" ->
      (OracleZoneMap.Common + OracleZoneMap.OptLive +
        OracleZoneMap.StaleCtes + OracleZoneMap.IncrCtes +
        ", lob AS (SELECT (3 * MAX(o_custkey)) // 8 AS lo, " +
        "(3 * MAX(o_custkey)) // 8 + MAX(o_custkey) // 16 AS hi " +
        "FROM zmo), " +
        "log2 AS (SELECT " +
        "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok " +
        "FROM zolv v, lob b WHERE v.o_custkey BETWEEN b.lo AND b.hi) " +
        "SELECT * FROM (" +
        "SELECT 2::BIGINT AS version, " +
        "(SELECT CAST(SUM(CASE WHEN z.max_ck >= b.lo AND " +
        "z.min_ck <= b.hi THEN 1 ELSE 0 END) AS BIGINT) " +
        "FROM zicz z, lob b) AS files_planned, " +
        "n_rows, sum_ok FROM log2 " +
        "UNION ALL SELECT 3::BIGINT, " +
        "(SELECT CAST(SUM(CASE WHEN z.max_ck >= b.lo AND " +
        "z.min_ck <= b.hi THEN 1 ELSE 0 END) AS BIGINT) " +
        "FROM zovz z, lob b), n_rows, sum_ok FROM log2) " +
        "ORDER BY version"),
    // q532: the TPC-H Q6 shape re-served from the lake's typed
    // lineitem instance — money in exact integer cents
    // (floor(price·100 + 0.5), the deterministic double op both
    // engines compute bit-identically), discount in basis points
    "q532_lake_lineitem_q6" ->
      ("SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, " +
        "CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) " +
        "* CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT)) " +
        "AS BIGINT) AS rev_cents_bp " +
        "FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "AND l_discount >= 0.02 AND l_discount <= 0.05 " +
        "AND CAST(l_quantity AS BIGINT) < 24 " +
        "GROUP BY l_returnflag ORDER BY l_returnflag"),
    // q533: the typed-zone plan audit — layout (shipdate-sorted
    // 512-row files) and every zone overlap re-derived in the NATIVE
    // domain (timestamps, dates, cents, doubles), bloom bits in
    // integer arithmetic; one planned file off on any typed encoding
    // breaks the hash
    "q533_lake_types_plan" ->
      ("WITH ltf AS (SELECT l_orderkey, l_shipdate, l_discount, " +
        "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents, " +
        "(ROW_NUMBER() OVER (ORDER BY l_shipdate, l_orderkey, " +
        "l_linenumber) - 1) // 512 AS file_id FROM lineitem), " +
        "ltz AS (SELECT file_id, MIN(l_shipdate) AS min_ts, " +
        "MAX(l_shipdate) AS max_ts, MIN(l_orderkey) AS min_ok, " +
        "MAX(l_orderkey) AS max_ok, MIN(cents) AS min_c, " +
        "MAX(cents) AS max_c, MIN(l_discount) AS min_d, " +
        "MAX(l_discount) AS max_d FROM ltf GROUP BY file_id), " +
        "ltt AS (SELECT CAST(COUNT(*) AS BIGINT) AS ft FROM ltz), " +
        "lkk AS (SELECT MAX(l_orderkey) AS k FROM lineitem), " +
        s"lpp AS (SELECT DISTINCT ((k.k * h.a + h.b) % 1048573) " +
        s"% 4096 AS pos FROM lkk k, $Hashes), " +
        s"lfp AS (SELECT DISTINCT f.file_id, ((f.l_orderkey * h.a " +
        s"+ h.b) % 1048573) % 4096 AS pos FROM ltf f, $Hashes), " +
        "lbm AS (SELECT z.file_id FROM ltz z, lkk k WHERE " +
        "k.k BETWEEN z.min_ok AND z.max_ok AND " +
        "(SELECT COUNT(*) FROM lpp) = (SELECT COUNT(*) FROM lpp pp " +
        "JOIN lfp fp ON fp.pos = pp.pos AND fp.file_id = z.file_id)) " +
        "SELECT * FROM (" +
        "SELECT '1_date_q1' AS pred_id, ft AS files_total, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ltz WHERE " +
        "CAST(max_ts AS DATE) >= DATE '1996-01-01' AND " +
        "CAST(min_ts AS DATE) <= DATE '1996-03-31') AS files_planned, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE " +
        "CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND " +
        "DATE '1996-03-31') AS n_rows FROM ltt " +
        "UNION ALL SELECT '2_ts_q1', ft, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ltz WHERE " +
        "max_ts >= TIMESTAMP '1996-01-01 00:00:00' AND " +
        "min_ts <= TIMESTAMP '1996-03-31 23:59:59'), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE " +
        "l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND " +
        "TIMESTAMP '1996-03-31 23:59:59') FROM ltt " +
        "UNION ALL SELECT '3_price_band', ft, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ltz WHERE " +
        "max_c >= 500000 AND min_c <= 550000), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ltf WHERE " +
        "cents BETWEEN 500000 AND 550000) FROM ltt " +
        "UNION ALL SELECT '4_disc_band', ft, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ltz WHERE " +
        "max_d >= 0.02 AND min_d <= 0.03), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE " +
        "l_discount >= 0.02 AND l_discount <= 0.03) FROM ltt " +
        "UNION ALL SELECT '5_okey_bloom', ft, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM lbm), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem, lkk " +
        "WHERE l_orderkey = k) FROM ltt) " +
        "ORDER BY pred_id"),
    // q534: the DSv2 write path's snapshot trail — three id-range
    // APPEND batches (4 hash-partitioned files each) then a REPLAYED
    // batch: 4 committed versions (the replay no-ops), cumulative
    // content per version
    "q534_lake_write_audit" ->
      ("WITH st AS (SELECT (MAX(o_orderkey) + 3) // 3 AS step " +
        "FROM orders), " +
        "vb AS (SELECT o_orderkey, o_orderkey // step AS bi " +
        "FROM orders, st), " +
        "vv AS (SELECT CAST(v AS BIGINT) AS version " +
        "FROM range(0, 4) t(v)) " +
        "SELECT v.version, " +
        "CAST(4 * v.version AS BIGINT) AS n_files, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM vb WHERE " +
        "bi < v.version) AS n_rows, " +
        "(SELECT CAST(COALESCE(SUM(o_orderkey), 0) AS BIGINT) " +
        "FROM vb WHERE bi < v.version) AS sum_ok, " +
        "4::BIGINT AS n_versions " +
        "FROM vv v ORDER BY v.version"),
    // q535: the q507 bucket probe against the DSv2-WRITTEN table —
    // all orders (no %37 fold on this instance)
    "q535_lake_write_pruned" ->
      ("WITH lmx AS (SELECT MAX(CAST(o_custkey AS BIGINT)) AS max_ck " +
        "FROM orders), " +
        "lbd AS (SELECT (3 * max_ck) // 8 AS lo, " +
        "(3 * max_ck) // 8 + max_ck // 16 AS hi FROM lmx) " +
        "SELECT CAST(o_custkey AS BIGINT) % 8 AS bucket, " +
        "CAST(COUNT(*) AS BIGINT) AS n_orders, " +
        "CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok " +
        "FROM orders, lbd WHERE CAST(o_custkey AS BIGINT) " +
        "BETWEEN lo AND hi GROUP BY bucket ORDER BY bucket"),
    // q536: the atomic partition replace — day 2024-01-15 replayed
    // without its %13 duplicates in ONE manifest swap; every other
    // day's files verbatim across versions
    "q536_lake_part_replace" ->
      ("WITH ef AS (SELECT event_id, CAST(ts AS DATE) AS d " +
        "FROM events), " +
        "pc AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt, " +
        "CAST(SUM(event_id) AS BIGINT) AS s, " +
        "CAST(SUM(CASE WHEN event_id % 13 <> 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS cnt_c, " +
        "CAST(SUM(CASE WHEN event_id % 13 <> 0 THEN event_id " +
        "ELSE 0 END) AS BIGINT) AS s_c FROM ef GROUP BY d), " +
        "tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS nall, " +
        "CAST(SUM(s) AS BIGINT) AS sall, " +
        "CAST(SUM((cnt + 255) // 256) AS BIGINT) AS f0 FROM pc), " +
        "dd AS (SELECT cnt AS nd, s AS sd, cnt_c AS ndc, s_c AS sdc, " +
        "(cnt + 255) // 256 AS fd, (cnt_c + 255) // 256 AS fdc " +
        "FROM pc WHERE d = DATE '2024-01-15') " +
        "SELECT * FROM (" +
        "SELECT 0::BIGINT AS version, f0 AS n_files, nall AS n_rows, " +
        "sall AS sum_eid, nd AS n_day_rows, sd AS sum_day_eid, " +
        "TRUE AS outside_untouched FROM tot, dd " +
        "UNION ALL SELECT 1::BIGINT, f0 - fd + fdc, nall - nd + ndc, " +
        "sall - sd + sdc, ndc, sdc, TRUE FROM tot, dd) " +
        "ORDER BY version"),
    // q537: partition×zone×bloom plan composition at v0 — the layout,
    // every partition value, ts/user zones and event_id bloom bits
    // re-derived; a day probe prunes by PARTITION, a point probe by
    // BLOOM, a composed probe by both
    "q537_lake_part_plan" ->
      ("WITH ef AS (SELECT event_id, ts, user_id, " +
        "DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) " +
        "AS pday, (ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE) " +
        "ORDER BY ts, event_id) - 1) // 256 AS chunk FROM events), " +
        "ez AS (SELECT pday, chunk, MIN(ts) AS min_ts, " +
        "MAX(ts) AS max_ts, MIN(event_id) AS min_e, " +
        "MAX(event_id) AS max_e, MIN(user_id) AS min_u, " +
        "MAX(user_id) AS max_u FROM ef GROUP BY pday, chunk), " +
        "ett AS (SELECT CAST(COUNT(*) AS BIGINT) AS ft FROM ez), " +
        "emx AS (SELECT MAX(event_id) AS ke, MAX(user_id) // 10 " +
        "AS hu FROM events), " +
        s"epp AS (SELECT DISTINCT ((m.ke * h.a + h.b) % 1048573) " +
        s"% 4096 AS pos FROM emx m, $Hashes), " +
        s"efp AS (SELECT DISTINCT f.pday, f.chunk, ((f.event_id * " +
        s"h.a + h.b) % 1048573) % 4096 AS pos FROM ef f, $Hashes), " +
        "ebm AS (SELECT z.pday, z.chunk FROM ez z, emx m WHERE " +
        "m.ke BETWEEN z.min_e AND z.max_e AND " +
        "(SELECT COUNT(*) FROM epp) = (SELECT COUNT(*) FROM epp pp " +
        "JOIN efp fp ON fp.pos = pp.pos WHERE fp.pday = z.pday AND " +
        "fp.chunk = z.chunk)) " +
        "SELECT * FROM (" +
        "SELECT '1_day_one' AS pred_id, ft AS files_total, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ez WHERE " +
        "pday = 19732) AS files_part, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ez WHERE " +
        "pday = 19732 AND max_ts >= TIMESTAMP '2024-01-10 00:00:00' " +
        "AND min_ts <= TIMESTAMP '2024-01-10 23:59:59') " +
        "AS files_planned, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE ts " +
        "BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND " +
        "TIMESTAMP '2024-01-10 23:59:59') AS n_rows FROM ett " +
        "UNION ALL SELECT '2_days_three', ft, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ez WHERE " +
        "pday BETWEEN 19732 AND 19734), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ez WHERE " +
        "pday BETWEEN 19732 AND 19734 AND max_ts >= " +
        "TIMESTAMP '2024-01-10 00:00:00' AND min_ts <= " +
        "TIMESTAMP '2024-01-12 23:59:59'), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE ts " +
        "BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND " +
        "TIMESTAMP '2024-01-12 23:59:59') FROM ett " +
        "UNION ALL SELECT '3_eid_point', ft, ft, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ebm), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM events, emx " +
        "WHERE event_id = ke) FROM ett " +
        "UNION ALL SELECT '4_day_user', ft, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ez WHERE " +
        "pday = 19732), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ez, emx WHERE " +
        "pday = 19732 AND max_ts >= TIMESTAMP '2024-01-10 00:00:00' " +
        "AND min_ts <= TIMESTAMP '2024-01-10 23:59:59' AND " +
        "min_u <= hu AND max_u >= 0), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM events, emx WHERE ts " +
        "BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND " +
        "TIMESTAMP '2024-01-10 23:59:59' AND user_id >= 0 AND " +
        "user_id <= hu) FROM ett) " +
        "ORDER BY pred_id"),
    // q538: the lake race census — 8 writers, 8 versions (create + 6
    // disjoint appends + 1 fold; the duplicate no-ops), content mass
    // conserved exactly once per orders row
    "q538_lake_race_census" ->
      ("SELECT 8::BIGINT AS n_writers, 8::BIGINT AS n_versions, " +
        "CAST(COUNT(*) AS BIGINT) AS n_rows_final, " +
        "CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys_final, " +
        "CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok_final, " +
        "TRUE AS fold_committed FROM orders"),
    // q539: the raced final state, full key grain — orders exactly
    // once under every interleaving
    "q539_lake_race_state" ->
      ("SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey " +
        "FROM orders ORDER BY o_orderkey, o_custkey"),
    // q540: the streaming sink's snapshot trail — 6 versions (create
    // + 5 one-file micro-batches; the replayed batch no-ops), content
    // mass = the whole feed exactly once
    "q540_lake_stream_audit" ->
      ("SELECT 6::BIGINT AS n_versions, " +
        "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_keys, " +
        "CAST(SUM(event_id) AS BIGINT) AS sum_eid FROM events"),
    // q541: the streaming-sunk table vs the batch twin at user grain
    "q541_lake_stream_twin" ->
      ("SELECT user_id % 100 AS user_bucket, " +
        "CAST(COUNT(*) AS BIGINT) AS n_events, " +
        "CAST(SUM(event_id) AS BIGINT) AS sum_eid " +
        "FROM events GROUP BY user_bucket ORDER BY user_bucket"),
    // q542: schema evolution across the boundary — v0 empty 2-col,
    // v1 the prefix in (k, cnt:int), v2 same rows re-declared 3-col
    // widened, v3 the tail appended with notes; cnt mass identical
    // across the v1→v2 boundary (the widen is metadata-only)
    "q542_lake_evolution_audit" ->
      ("WITH st AS (SELECT (MAX(o_orderkey) + 3) // 3 AS step " +
        "FROM orders), " +
        "pre AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(o_custkey AS BIGINT)) AS BIGINT) AS s " +
        "FROM orders, st WHERE o_orderkey < 2 * step), " +
        "al AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(o_custkey AS BIGINT)) AS BIGINT) AS s " +
        "FROM orders), " +
        "tl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders, st " +
        "WHERE o_orderkey >= 2 * step) " +
        "SELECT * FROM (" +
        "SELECT 0::BIGINT AS version, 2::BIGINT AS n_cols, " +
        "0::BIGINT AS n_rows, 0::BIGINT AS sum_cnt, " +
        "0::BIGINT AS n_notes " +
        "UNION ALL SELECT 1::BIGINT, 2::BIGINT, n, s, 0::BIGINT " +
        "FROM pre " +
        "UNION ALL SELECT 2::BIGINT, 3::BIGINT, n, s, 0::BIGINT " +
        "FROM pre " +
        "UNION ALL SELECT 3::BIGINT, 3::BIGINT, al.n, al.s, tl.n " +
        "FROM al, tl) ORDER BY version"),
    // q543: the bridged registry ledger's head through the provider —
    // the drained registry equals the full corpus per source
    "q543_lake_ledger_head" ->
      ("SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM documents " +
        "GROUP BY source ORDER BY source"),
    // q531: snapshot expiry — keeping only v3 deletes every pre-fold
    // data file (both z-order generations) and every DV file; the
    // retained read is intact and the expired one is physically gone
    "q531_lake_expire_audit" ->
      (OracleZoneMap.Common + OracleZoneMap.StaleCtes +
        OracleZoneMap.IncrCtes +
        ", lxm AS (SELECT (MAX(o_orderkey) + 3) // 3 AS step, " +
        "CAST(COUNT(*) AS BIGINT) AS nall, " +
        "CAST(SUM(CASE WHEN o_orderkey % 37 = 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS ndel FROM zmo), " +
        "lxn AS (SELECT nall, ndel, nall - ndel AS nlive, " +
        "CAST((SELECT COUNT(*) FROM zmo, lxm " +
        "WHERE o_orderkey < 2 * step) AS BIGINT) AS n0 FROM lxm), " +
        "lxd AS (SELECT CAST(COUNT(DISTINCT file_id) AS BIGINT) AS " +
        "nwithdv FROM zitf WHERE o_orderkey % 37 = 0) " +
        "SELECT 3::BIGINT AS kept_from, " +
        "CAST((n0 + 255) // 256 + (nall - n0 + 255) // 256 + " +
        "(SELECT nwithdv FROM lxd) AS BIGINT) AS n_files_deleted, " +
        "CAST((nlive + 255) // 256 AS BIGINT) AS n_files_kept, " +
        "nlive AS n_rows_live, TRUE AS expired_read_fails, " +
        "TRUE AS history_was_larger FROM lxn"),
    // q544: the manifest-served aggregate — COUNT + MIN/MAX over
    // four typed zone encodings recomputed from raw lineitem in
    // exact integer domains (epoch days, cents, basis points);
    // agg_pushed pins that the plan never opened a data file
    "q544_lake_agg_pushdown" ->
      ("SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(MIN(CAST(l_shipdate AS DATE)) - DATE '1970-01-01' " +
        "AS BIGINT) AS min_ship_day, " +
        "CAST(MAX(CAST(l_shipdate AS DATE)) - DATE '1970-01-01' " +
        "AS BIGINT) AS max_ship_day, " +
        "CAST(MIN(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) " +
        "AS BIGINT) AS min_price_cents, " +
        "CAST(MAX(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) " +
        "AS BIGINT) AS max_price_cents, " +
        "CAST(MIN(l_orderkey) AS BIGINT) AS min_ok, " +
        "CAST(MAX(l_orderkey) AS BIGINT) AS max_ok, " +
        "CAST(FLOOR(MIN(l_discount) * 10000 + 0.5) AS BIGINT) " +
        "AS min_disc_bp, " +
        "CAST(FLOOR(MAX(l_discount) * 10000 + 0.5) AS BIGINT) " +
        "AS max_disc_bp, " +
        "1::BIGINT AS agg_pushed FROM lineitem"),
    // q545: the pushdown decision matrix — pushed flags are the
    // CONTRACT (count over DVs pushes; min over DVs, filtered and
    // grouped aggregates must not), values recomputed from raw
    // orders (%37 masked at v2) and lineitem
    "q545_lake_agg_matrix" ->
      ("SELECT * FROM (" +
        "SELECT '1_count_dv' AS case_id, 1::BIGINT AS pushed, " +
        "CAST(COUNT(*) AS BIGINT) AS val FROM orders " +
        "WHERE o_orderkey % 37 <> 0 " +
        "UNION ALL SELECT '2_min_dv', 0::BIGINT, " +
        "CAST(MIN(o_orderkey) AS BIGINT) FROM orders " +
        "WHERE o_orderkey % 37 <> 0 " +
        "UNION ALL SELECT '3_max_clean', 1::BIGINT, " +
        "CAST(MAX(l_orderkey) AS BIGINT) FROM lineitem " +
        "UNION ALL SELECT '4_filtered', 0::BIGINT, " +
        "CAST(COUNT(*) AS BIGINT) FROM lineitem " +
        "WHERE CAST(l_quantity AS BIGINT) < 10 " +
        "UNION ALL SELECT '5_grouped', 0::BIGINT, " +
        "CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) FROM lineitem) " +
        "ORDER BY case_id"),
    // q546: the statistics audit — estimates (live rows over
    // zone-admitted files, the limit prefix) re-derived from the
    // Z-order layout frame; broadcast build-side flags are the
    // CONTRACT (pruned lake side builds; a 16-key probe side builds
    // against the full lake; a limit caps the estimate)
    "q546_lake_stats_plan" ->
      (OracleZoneMap.Common + OracleZoneMap.OptLive +
        ", lsb AS (SELECT (3 * max_ck) // 8 AS lo, " +
        "(3 * max_ck) // 8 + max_ck // 64 AS hi FROM zmmx), " +
        "lsc AS (SELECT file_id, n_rows, " +
        "SUM(n_rows) OVER (ORDER BY file_id) - n_rows AS cumb " +
        "FROM zovz), " +
        "lsk AS (SELECT DISTINCT (j * (SELECT max_ok FROM zmmx)) " +
        "// 17 AS k FROM range(1, 17) t(j)) " +
        "SELECT * FROM (" +
        "SELECT '1_pruned' AS case_id, " +
        "(SELECT CAST(SUM(z.n_rows) AS BIGINT) FROM zovz z, lsb b " +
        "WHERE z.max_ck >= b.lo AND z.min_ck <= b.hi) AS est_rows, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zovz z, lsb b " +
        "WHERE z.max_ck >= b.lo AND z.min_ck <= b.hi) " +
        "AS files_planned, " +
        "1::BIGINT AS bcast_lake, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l " +
        "JOIN zolv v ON l.l_orderkey = v.o_orderkey, lsb b WHERE " +
        "v.o_custkey BETWEEN b.lo AND b.hi) AS n_rows " +
        "UNION ALL SELECT '2_tiny_probe', " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zolv), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zovz), 0::BIGINT, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zolv WHERE " +
        "o_orderkey IN (SELECT k FROM lsk)) " +
        "UNION ALL SELECT '3_limit', " +
        "(SELECT CAST(LEAST(500, SUM(n_rows)) AS BIGINT) FROM lsc " +
        "WHERE cumb < 500), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM lsc WHERE cumb < 500), " +
        "-1::BIGINT, 500::BIGINT) " +
        "ORDER BY case_id"),
    // q547: the stats-steered broadcast join — pruned lake side ⋈
    // the %3 key sample, bucket rollup; bcast pins the build side
    "q547_lake_stats_join" ->
      ("WITH lmx AS (SELECT MAX(CAST(o_custkey AS BIGINT)) AS max_ck " +
        "FROM orders), " +
        "lbd AS (SELECT (3 * max_ck) // 8 AS lo, " +
        "(3 * max_ck) // 8 + max_ck // 64 AS hi FROM lmx), " +
        "llv AS (SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS " +
        "o_custkey FROM orders WHERE o_orderkey % 37 <> 0) " +
        "SELECT o_custkey % 8 AS bucket, " +
        "CAST(COUNT(*) AS BIGINT) AS n_li, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, " +
        "1::BIGINT AS bcast " +
        "FROM llv JOIN lineitem ON l_orderkey = o_orderkey, lbd " +
        "WHERE o_custkey BETWEEN lo AND hi " +
        "GROUP BY bucket ORDER BY bucket"),
    // q548: the merged state — raw orders with the key-band custkeys
    // bumped by 1e6 plus 50 fresh inserts past the max, re-bucketed;
    // a lost update, doubled insert, or replayed row breaks it
    "q548_lake_merge_state" ->
      ("WITH mmx AS (SELECT MAX(o_orderkey) AS mx FROM orders), " +
        "mbd AS (SELECT (5 * mx) // 8 AS lo, " +
        "(5 * mx) // 8 + mx // 64 AS hi, mx FROM mmx), " +
        "mrg AS (SELECT o_orderkey, CASE WHEN o_orderkey BETWEEN " +
        "b.lo AND b.hi THEN CAST(o_custkey AS BIGINT) + 1000000 " +
        "ELSE CAST(o_custkey AS BIGINT) END AS ck FROM orders, mbd b " +
        "UNION ALL SELECT b.mx + j, CAST(j AS BIGINT) " +
        "FROM range(1, 51) t(j), mbd b) " +
        "SELECT ck % 8 AS bucket, " +
        "CAST(COUNT(*) AS BIGINT) AS n_orders, " +
        "CAST(SUM(ck) AS BIGINT) AS sum_ck, " +
        "CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok " +
        "FROM mrg GROUP BY bucket ORDER BY bucket"),
    // q549: the copy-on-write audit — the id-sorted 256-row layout,
    // the files the key band touches, and the key-sorted re-file
    // count, all re-derived; a merge that rewrote one untouched file
    // or kept one touched breaks it
    "q549_lake_merge_audit" ->
      ("WITH mmx AS (SELECT MAX(o_orderkey) AS mx, " +
        "CAST(COUNT(*) AS BIGINT) AS n0 FROM orders), " +
        "mbd AS (SELECT (5 * mx) // 8 AS lo, " +
        "(5 * mx) // 8 + mx // 64 AS hi FROM mmx), " +
        "mfr AS (SELECT o_orderkey, (ROW_NUMBER() OVER " +
        "(ORDER BY o_orderkey) - 1) // 256 AS file_id FROM orders), " +
        "mtf AS (SELECT DISTINCT f.file_id FROM mfr f, mbd b " +
        "WHERE f.o_orderkey BETWEEN b.lo AND b.hi), " +
        "mtr AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM mtf), " +
        "mrr AS (SELECT CAST(COUNT(*) AS BIGINT) AS r FROM mfr " +
        "WHERE file_id IN (SELECT file_id FROM mtf)), " +
        "mf0 AS (SELECT (n0 + 255) // 256 AS f0, n0 FROM mmx) " +
        "SELECT * FROM (" +
        "SELECT 0::BIGINT AS version, f0 AS n_files, n0 AS n_rows, " +
        "0::BIGINT AS files_kept, 0::BIGINT AS files_new FROM mf0 " +
        "UNION ALL SELECT 1::BIGINT, " +
        "(SELECT f0 FROM mf0) - (SELECT t FROM mtr) + " +
        "((SELECT r FROM mrr) + 50 + 255) // 256, " +
        "(SELECT n0 FROM mf0) + 50, " +
        "(SELECT f0 FROM mf0) - (SELECT t FROM mtr), " +
        "((SELECT r FROM mrr) + 50 + 255) // 256) " +
        "ORDER BY version"),
    // q550: the runtime-prune audit — the newest-cohort custkeys
    // (top 1/32), per-key zone admission over the Z-order layout,
    // and the pruned row count, all re-derived
    "q550_lake_runtime_prune" ->
      (OracleZoneMap.Common + OracleZoneMap.OptLive +
        ", rcx AS (SELECT MAX(CAST(c_custkey AS BIGINT)) AS mc " +
        "FROM customer), " +
        "rck AS (SELECT DISTINCT CAST(c_custkey AS BIGINT) AS k " +
        "FROM customer, rcx WHERE c_custkey >= (31 * mc) // 32) " +
        "SELECT 'dim_cohort' AS probe_id, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zovz) AS files_total, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zovz z WHERE EXISTS " +
        "(SELECT 1 FROM rck WHERE k BETWEEN z.min_ck AND z.max_ck)) " +
        "AS files_planned, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM rck) AS n_keys, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM zolv v JOIN rck " +
        "ON v.o_custkey = rck.k) AS n_rows"),
    // q551: the runtime-pruned join — the cohort's orders per
    // nation, value-identical to the plain join over raw tables
    "q551_lake_runtime_join" ->
      ("WITH rcx AS (SELECT MAX(CAST(c_custkey AS BIGINT)) AS mc " +
        "FROM customer), " +
        "rcd AS (SELECT CAST(c_custkey AS BIGINT) AS k, " +
        "CAST(c_nationkey AS BIGINT) AS nation FROM customer, rcx " +
        "WHERE c_custkey >= (31 * mc) // 32), " +
        "llv AS (SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS " +
        "o_custkey FROM orders WHERE o_orderkey % 37 <> 0) " +
        "SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_orders, " +
        "CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok " +
        "FROM llv JOIN rcd ON o_custkey = k " +
        "GROUP BY nation ORDER BY nation"),
    // q552: the storage-partitioned-join audit — day-partition count
    // and the join cardinality (each event meets exactly its
    // (day,user) summary row) re-derived from raw events; the
    // shuffle counts are the plan CONTRACT (0 co-partitioned, 2
    // shuffled)
    "q552_lake_spj_plan" ->
      ("WITH sev AS (SELECT CAST(ts AS DATE) - DATE '1970-01-01' " +
        "AS day FROM events), " +
        "sdc AS (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS nd, " +
        "CAST(COUNT(*) AS BIGINT) AS ne FROM sev) " +
        "SELECT * FROM (" +
        "SELECT '1_spj' AS mode, nd AS n_day_partitions, " +
        "0::BIGINT AS n_shuffles, ne AS n_rows FROM sdc " +
        "UNION ALL SELECT '2_shuffled', nd, 2::BIGINT, ne FROM sdc) " +
        "ORDER BY mode"),
    // q553: the enrichment through the SPJ — per weekday: events,
    // exact integer cents, and the summed (day,user) group sizes
    "q553_lake_spj_rollup" ->
      ("WITH sev AS (SELECT CAST(ts AS DATE) - DATE '1970-01-01' " +
        "AS day, user_id, " +
        "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents " +
        "FROM events), " +
        "sdu AS (SELECT day, user_id, " +
        "CAST(COUNT(*) AS BIGINT) AS n_ev FROM sev " +
        "GROUP BY day, user_id) " +
        "SELECT e.day % 7 AS weekday, " +
        "CAST(COUNT(*) AS BIGINT) AS n_events, " +
        "CAST(SUM(e.cents) AS BIGINT) AS sum_cents, " +
        "CAST(SUM(d.n_ev) AS BIGINT) AS sum_group " +
        "FROM sev e JOIN sdu d ON e.day = d.day AND " +
        "e.user_id = d.user_id " +
        "GROUP BY weekday ORDER BY weekday"),
    // q554: the partitioned DSv2 write — one file per day per batch
    // (the clustering contract), counts per snapshot from raw
    // events; versions_committed pins the replay no-op (3, not 4)
    "q554_lake_pwrite_audit" ->
      ("WITH pev AS (SELECT CAST(ts AS DATE) - DATE '1970-01-01' " +
        "AS day FROM events), " +
        "pmd AS (SELECT MIN(day) + 14 AS mid FROM pev), " +
        "ph0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(COUNT(DISTINCT day) AS BIGINT) AS d FROM pev, pmd " +
        "WHERE day < mid), " +
        "ph1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(COUNT(DISTINCT day) AS BIGINT) AS d FROM pev, pmd " +
        "WHERE day >= mid) " +
        "SELECT * FROM (" +
        "SELECT 0::BIGINT AS version, 0::BIGINT AS n_files, " +
        "0::BIGINT AS n_rows, 0::BIGINT AS n_days, " +
        "3::BIGINT AS versions_committed " +
        "UNION ALL SELECT 1::BIGINT, d, n, d, 3::BIGINT FROM ph0 " +
        "UNION ALL SELECT 2::BIGINT, " +
        "(SELECT d FROM ph0) + (SELECT d FROM ph1), " +
        "(SELECT n FROM ph0) + (SELECT n FROM ph1), " +
        "(SELECT CAST(COUNT(DISTINCT day) AS BIGINT) FROM pev), " +
        "3::BIGINT) ORDER BY version"),
    // q555: partition + zone pruning on the DSv2-written table — the
    // one-file-per-day layout and each day's event_id zone
    // re-derived from raw events
    "q555_lake_pwrite_pruned" ->
      ("WITH pev AS (SELECT CAST(ts AS DATE) - DATE '1970-01-01' " +
        "AS day, event_id FROM events), " +
        "pdz AS (SELECT day, MIN(event_id) AS mn FROM pev " +
        "GROUP BY day), " +
        "pbb AS (SELECT MIN(day) + 7 AS lo, MIN(day) + 13 AS hi " +
        "FROM pev), " +
        "pme AS (SELECT MAX(event_id) // 2 AS half FROM pev), " +
        "pft AS (SELECT CAST(COUNT(*) AS BIGINT) AS ft FROM pdz) " +
        "SELECT * FROM (" +
        "SELECT '1_week' AS probe_id, ft AS files_total, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM pdz, pbb WHERE " +
        "day BETWEEN lo AND hi) AS files_planned, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM pev, pbb WHERE " +
        "day BETWEEN lo AND hi) AS n_rows FROM pft " +
        "UNION ALL SELECT '2_week_zone', ft, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM pdz, pbb, pme WHERE " +
        "day BETWEEN lo AND hi AND mn <= half), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM pev, pbb, pme WHERE " +
        "day BETWEEN lo AND hi AND event_id <= half) FROM pft) " +
        "ORDER BY probe_id"),
    // q556: changes-since deltas on the id-range batch layout — the
    // files added after version v are exactly batches v..2
    "q556_lake_changes_audit" ->
      ("WITH wst AS (SELECT (MAX(o_orderkey) + 3) // 3 AS step " +
        "FROM orders) " +
        "SELECT * FROM (" +
        "SELECT 0::BIGINT AS from_version, " +
        "CAST(COUNT(*) AS BIGINT) AS n_rows_new, " +
        "CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok_new FROM orders " +
        "UNION ALL SELECT 1::BIGINT, CAST(COUNT(*) AS BIGINT), " +
        "CAST(SUM(o_orderkey) AS BIGINT) FROM orders, wst " +
        "WHERE o_orderkey >= step " +
        "UNION ALL SELECT 2::BIGINT, CAST(COUNT(*) AS BIGINT), " +
        "CAST(SUM(o_orderkey) AS BIGINT) FROM orders, wst " +
        "WHERE o_orderkey >= 2 * step) " +
        "ORDER BY from_version"),
    // q557: the incremental-read contract — append ranges serve the
    // tail, DV-only ranges serve nothing, rewrite ranges refuse
    "q557_lake_changes_matrix" ->
      ("WITH ist AS (SELECT (MAX(o_orderkey) + 3) // 3 AS step " +
        "FROM orders) " +
        "SELECT * FROM (" +
        "SELECT '1_append' AS case_id, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM orders, ist WHERE " +
        "o_orderkey >= 2 * step) AS n_rows_new, " +
        "0::BIGINT AS refused " +
        "UNION ALL SELECT '2_dv_only', 0::BIGINT, 0::BIGINT " +
        "UNION ALL SELECT '3_rewrite', -1::BIGINT, 1::BIGINT) " +
        "ORDER BY case_id"),
    // q558: the streaming drain of the written table equals the
    // batch read — every append consumed exactly once
    "q558_lake_stream_source" ->
      ("SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok, " +
        "1::BIGINT AS drained FROM orders"),
    // q559: checkpointed resume — phase 1 = the first id-range
    // batch, phase 2 = only the delta appended after it
    "q559_lake_stream_resume" ->
      ("WITH rst AS (SELECT (MAX(o_orderkey) + 3) // 3 AS step " +
        "FROM orders) " +
        "SELECT * FROM (" +
        "SELECT 1::BIGINT AS phase, CAST(COUNT(*) AS BIGINT) AS " +
        "n_rows, CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok " +
        "FROM orders, rst WHERE o_orderkey < step " +
        "UNION ALL SELECT 2::BIGINT, CAST(COUNT(*) AS BIGINT), " +
        "CAST(SUM(o_orderkey) AS BIGINT) FROM orders, rst " +
        "WHERE o_orderkey >= step) " +
        "ORDER BY phase"),
    // q560: the DELETE audit — per snapshot, which id-sorted files
    // the two overlapping ranges touch and the union of their
    // vectors, all re-derived from raw orders
    "q560_lake_delete_audit" ->
      ("WITH dmx AS (SELECT MAX(o_orderkey) AS mx, " +
        "CAST(COUNT(*) AS BIGINT) AS n0 FROM orders), " +
        "dbd AS (SELECT (3 * mx) // 8 AS a0, " +
        "(3 * mx) // 8 + mx // 32 AS a1, " +
        "(3 * mx) // 8 + mx // 64 AS b0, " +
        "(3 * mx) // 8 + mx // 16 AS b1 FROM dmx), " +
        "dfr AS (SELECT o_orderkey, (ROW_NUMBER() OVER " +
        "(ORDER BY o_orderkey) - 1) // 256 AS file_id FROM orders), " +
        "dd1 AS (SELECT o_orderkey, file_id FROM dfr, dbd WHERE " +
        "o_orderkey BETWEEN a0 AND a1), " +
        "dd2 AS (SELECT o_orderkey, file_id FROM dfr, dbd WHERE " +
        "o_orderkey BETWEEN a0 AND a1 OR " +
        "o_orderkey BETWEEN b0 AND b1) " +
        "SELECT * FROM (" +
        "SELECT 0::BIGINT AS version, 0::BIGINT AS files_with_dv, " +
        "0::BIGINT AS dv_rows, n0 AS rows_live, " +
        "3::BIGINT AS versions_committed FROM dmx " +
        "UNION ALL SELECT 1::BIGINT, " +
        "(SELECT CAST(COUNT(DISTINCT file_id) AS BIGINT) FROM dd1), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM dd1), " +
        "n0 - (SELECT CAST(COUNT(*) AS BIGINT) FROM dd1), " +
        "3::BIGINT FROM dmx " +
        "UNION ALL SELECT 2::BIGINT, " +
        "(SELECT CAST(COUNT(DISTINCT file_id) AS BIGINT) FROM dd2), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM dd2), " +
        "n0 - (SELECT CAST(COUNT(*) AS BIGINT) FROM dd2), " +
        "3::BIGINT FROM dmx) " +
        "ORDER BY version"),
    // q561: post-delete live state — orders minus the union of the
    // two ranges, re-bucketed
    "q561_lake_delete_state" ->
      ("WITH dmx AS (SELECT MAX(o_orderkey) AS mx FROM orders), " +
        "dbd AS (SELECT (3 * mx) // 8 AS a0, " +
        "(3 * mx) // 8 + mx // 32 AS a1, " +
        "(3 * mx) // 8 + mx // 64 AS b0, " +
        "(3 * mx) // 8 + mx // 16 AS b1 FROM dmx) " +
        "SELECT CAST(o_custkey AS BIGINT) % 8 AS bucket, " +
        "CAST(COUNT(*) AS BIGINT) AS n_orders, " +
        "CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok " +
        "FROM orders, dbd WHERE " +
        "NOT (o_orderkey BETWEEN a0 AND a1) AND " +
        "NOT (o_orderkey BETWEEN b0 AND b1) " +
        "GROUP BY bucket ORDER BY bucket"),
    // q562: the incrementally-folded silver equals a FULL recompute
    // from raw orders — nothing lost, nothing doubled across cycles
    "q562_lake_medallion_state" ->
      ("WITH ms AS (SELECT CAST(o_custkey AS BIGINT) AS ck, " +
        "CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(o_orderkey) AS BIGINT) AS s FROM orders " +
        "GROUP BY ck) " +
        "SELECT ck % 8 AS bucket, " +
        "CAST(COUNT(*) AS BIGINT) AS n_keys, " +
        "CAST(SUM(n) AS BIGINT) AS n_orders, " +
        "CAST(SUM(s) AS BIGINT) AS sum_ok " +
        "FROM ms GROUP BY bucket ORDER BY bucket"),
    // q563: the refresh trail — per silver snapshot: summary rows,
    // the consumed-through bronze cursor, and the version count
    // pinning the caught-up no-op
    "q563_lake_medallion_audit" ->
      ("WITH wst AS (SELECT (MAX(o_orderkey) + 3) // 3 AS step " +
        "FROM orders), " +
        "mh1 AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) " +
        "AS k FROM orders, wst WHERE o_orderkey < 2 * step), " +
        "mht AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) " +
        "AS k FROM orders) " +
        "SELECT * FROM (" +
        "SELECT 0::BIGINT AS version, 0::BIGINT AS n_rows, " +
        "0::BIGINT AS cursor, 3::BIGINT AS versions_committed " +
        "UNION ALL SELECT 1::BIGINT, (SELECT k FROM mh1), " +
        "2::BIGINT, 3::BIGINT " +
        "UNION ALL SELECT 2::BIGINT, (SELECT k FROM mht), " +
        "3::BIGINT, 3::BIGINT) " +
        "ORDER BY version"),
    // q564: post-vacuum snapshot parity — both snapshots answer in
    // full after the sweep (id-range halves from raw orders); the
    // version trail intact
    "q564_lake_vacuum_audit" ->
      ("WITH vst AS (SELECT (MAX(o_orderkey) + 2) // 2 AS step " +
        "FROM orders) " +
        "SELECT * FROM (" +
        "SELECT 1::BIGINT AS version, CAST(COUNT(*) AS BIGINT) AS " +
        "n_rows, CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok, " +
        "3::BIGINT AS versions_committed FROM orders, vst " +
        "WHERE o_orderkey < step " +
        "UNION ALL SELECT 2::BIGINT, CAST(COUNT(*) AS BIGINT), " +
        "CAST(SUM(o_orderkey) AS BIGINT), 3::BIGINT FROM orders) " +
        "ORDER BY version"),
    // q565: post-vacuum full state — a sweep that deleted one
    // referenced byte breaks this
    "q565_lake_vacuum_state" ->
      ("SELECT CAST(o_custkey AS BIGINT) % 8 AS bucket, " +
        "CAST(COUNT(*) AS BIGINT) AS n_orders, " +
        "CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok " +
        "FROM orders GROUP BY bucket ORDER BY bucket"))
}
