package graft.oracles

/** DuckDB oracles for RLS/masking (q472–q473) and the shallow-clone
  * rehearsal (q474–q475). CTE prefix `gv`.
  */
object OracleGovernance {

  private val Policy =
    "gvp AS (SELECT * FROM (VALUES " +
      "('analyst_eu', 0, true, false), " +
      "('analyst_eu', 1, true, false), " +
      "('analyst_na', 2, false, true), " +
      "('admin', 0, false, false), ('admin', 1, false, false), " +
      "('admin', 2, false, false), ('admin', 3, false, false), " +
      "('admin', 4, false, false)) " +
      "p(role, region, mask_name, mask_balance)) "

  private val Cust =
    "gvc AS (SELECT c_custkey, c_name, CAST(n_regionkey AS BIGINT) " +
      "AS region, c_acctbal FROM customer JOIN nation ON " +
      "c_nationkey = n_nationkey) "

  private val Batched =
    "gvd AS (SELECT doc_id, " +
      "LEAST((doc_id - (SELECT MIN(doc_id) FROM documents)) // " +
      "((SELECT MAX(doc_id) - MIN(doc_id) + 3 FROM documents) // 3), " +
      "2) AS batch FROM documents) "

  val sql: Map[String, String] = Map(
    // q472: per-role visibility + masking audit, balances in cents
    "q472_rls_mask_audit" ->
      ("WITH " + Policy + ", " + Cust +
        "SELECT p.role, CAST(COUNT(*) AS BIGINT) AS n_visible, " +
        "CAST(SUM(CASE WHEN p.mask_name THEN 1 ELSE 0 END) AS " +
        "BIGINT) AS n_names_masked, " +
        "CAST(SUM(CASE WHEN p.mask_balance THEN 1 ELSE 0 END) AS " +
        "BIGINT) AS n_balances_masked, " +
        "CAST(SUM(CASE WHEN NOT p.mask_balance THEN " +
        "CAST(ROUND(c.c_acctbal * 100) AS BIGINT) ELSE 0 END) AS " +
        "BIGINT) AS visible_balance_cents " +
        "FROM gvc c JOIN gvp p ON c.region = p.region " +
        "GROUP BY p.role ORDER BY p.role"),
    // q473: the analyst_eu masked release at row grain
    "q473_masked_release" ->
      ("WITH " + Cust +
        "SELECT c_custkey, md5('nm|' || CAST(c_custkey AS VARCHAR)) " +
        "AS name_token, region, CAST(ROUND(c_acctbal * 100) AS " +
        "BIGINT) AS acctbal_cents FROM gvc WHERE region IN (0, 1) " +
        "ORDER BY c_custkey"),
    // q474: the branch rehearsed the erasure; the source kept every key
    "q474_clone_divergence" ->
      ("SELECT * FROM (" +
        "SELECT 'clone' AS side, CAST((SELECT COUNT(*) FROM " +
        "documents WHERE doc_id % 37 <> 0) AS BIGINT) AS n_rows, " +
        "0::BIGINT AS n_erased_readable " +
        "UNION ALL SELECT 'source', CAST((SELECT COUNT(*) FROM " +
        "documents) AS BIGINT), CAST((SELECT COUNT(*) FROM documents " +
        "WHERE doc_id % 37 = 0) AS BIGINT)) ORDER BY side"),
    // q475: version trail from the clone's view — three shared batch
    // prefixes, one owned rehearsal delta
    "q475_clone_storage_audit" ->
      ("WITH " + Batched +
        "SELECT * FROM (" +
        "SELECT 0::BIGINT AS version, CAST((SELECT COUNT(*) FROM gvd " +
        "WHERE batch = 0) AS BIGINT) AS n_rows, FALSE AS owned " +
        "UNION ALL SELECT 1::BIGINT, CAST((SELECT COUNT(*) FROM gvd " +
        "WHERE batch <= 1) AS BIGINT), FALSE " +
        "UNION ALL SELECT 2::BIGINT, CAST((SELECT COUNT(*) FROM gvd) " +
        "AS BIGINT), FALSE " +
        "UNION ALL SELECT 3::BIGINT, CAST((SELECT COUNT(*) FROM " +
        "documents WHERE doc_id % 37 <> 0) AS BIGINT), TRUE) " +
        "ORDER BY version"),
    // q492: the merge audit — fork at v2 (the 3-batch drain's head),
    // the rehearsal's %37 deletes, an unmoved source, a clean merge
    // committing v3 with the retained row count
    "q492_branch_merge_audit" ->
      ("SELECT 2::BIGINT AS fork_version, " +
        "CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 37 = 0) " +
        "AS BIGINT) AS n_clone_deletes, " +
        "0::BIGINT AS n_clone_upserts, 0::BIGINT AS n_source_changes, " +
        "0::BIGINT AS n_conflicts, 'merged' AS outcome, " +
        "3::BIGINT AS merged_version, " +
        "CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 37 <> 0) " +
        "AS BIGINT) AS merged_rows"),
    // q493: the merged source head — identical to executing the
    // erasure on the source directly
    "q493_branch_merge_state" ->
      ("SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM documents " +
        "WHERE doc_id % 37 <> 0 GROUP BY source ORDER BY source"),
    // q494: the OCC ledger AS OF v1 (writer A's +7 only) released to
    // analyst_eu — regions 0–1, keys tokenized, balances clear
    "q494_asof_governed_balances" ->
      ("WITH ttb AS (SELECT CAST(o_custkey AS BIGINT) AS c_custkey, " +
        "CAST(COUNT(*) AS BIGINT) AS base_n FROM orders GROUP BY 1), " +
        "ttr AS (SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, " +
        "CAST(n.n_regionkey AS BIGINT) AS region FROM customer c " +
        "JOIN nation n ON c.c_nationkey = n.n_nationkey) " +
        "SELECT md5('nm|' || CAST(b.c_custkey AS VARCHAR)) AS " +
        "name_token, r.region, " +
        "CAST(b.base_n + CASE WHEN b.c_custkey % 3 = 0 THEN 7 ELSE 0 " +
        "END AS BIGINT) AS n_orders " +
        "FROM ttb b JOIN ttr r ON b.c_custkey = r.c_custkey " +
        "WHERE r.region IN (0, 1) ORDER BY name_token"),
    // q495: the registry AS OF batch 1 — exactly batches 0–1 of the
    // deterministic id-range split
    "q495_asof_batch_registry" ->
      ("WITH ttm AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi " +
        "FROM documents), " +
        "ttd AS (SELECT d.source, CAST(d.n_chars AS BIGINT) AS " +
        "n_chars, LEAST((d.doc_id - m.lo) // ((m.hi - m.lo + 3) // 3)" +
        ", 2) AS b FROM documents d, ttm m) " +
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM ttd " +
        "WHERE b <= 1 GROUP BY source ORDER BY source"),
    // q512: the wall-clock AS OF — 01:30 on the fixture clock (epoch
    // + 1h per batch) resolves to the 01:00 version = batches 0–1,
    // the same retained set as the batch axis at position 1
    "q512_asof_time_registry" ->
      ("WITH ttm AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi " +
        "FROM documents), " +
        "ttd AS (SELECT d.source, CAST(d.n_chars AS BIGINT) AS " +
        "n_chars, LEAST((d.doc_id - m.lo) // ((m.hi - m.lo + 3) // 3)" +
        ", 2) AS b FROM documents d, ttm m) " +
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM ttd " +
        "WHERE b <= 1 GROUP BY source ORDER BY source"),
    // q513: equal commit timestamps resolve to the HIGHEST version —
    // the serial A-then-B end state (+7 on %3==0, +11 on %3==1),
    // governed exactly like q494
    "q513_asof_time_governed" ->
      ("WITH ttb AS (SELECT CAST(o_custkey AS BIGINT) AS c_custkey, " +
        "CAST(COUNT(*) AS BIGINT) AS base_n FROM orders GROUP BY 1), " +
        "ttr AS (SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, " +
        "CAST(n.n_regionkey AS BIGINT) AS region FROM customer c " +
        "JOIN nation n ON c.c_nationkey = n.n_nationkey) " +
        "SELECT md5('nm|' || CAST(b.c_custkey AS VARCHAR)) AS " +
        "name_token, r.region, " +
        "CAST(b.base_n + CASE WHEN b.c_custkey % 3 = 0 THEN 7 " +
        "WHEN b.c_custkey % 3 = 1 THEN 11 ELSE 0 END AS BIGINT) AS " +
        "n_orders " +
        "FROM ttb b JOIN ttr r ON b.c_custkey = r.c_custkey " +
        "WHERE r.region IN (0, 1) ORDER BY name_token"))
}
