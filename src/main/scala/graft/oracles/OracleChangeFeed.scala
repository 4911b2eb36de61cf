package graft.oracles

/** DuckDB oracles for the change-data-feed family (q452–q454). The
  * ledgers' version contents are analytic (id-range batches, the
  * %37 erasure, the fixed OCC schedule), so each feed row is
  * recomputable from the base tables. CTE prefix `cf` is unique to
  * this family.
  */
object OracleChangeFeed {

  private val RegistryBase =
    "WITH cfd AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS " +
      "n_chars FROM documents), " +
      "cfm AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM cfd), " +
      "cfs AS (SELECT lo, (hi - lo + 3) // 3 AS span FROM cfm), " +
      "cfb AS (SELECT d.*, LEAST((d.doc_id - s.lo) // s.span, 2) AS " +
      "batch FROM cfd d, cfs s) "

  val sql: Map[String, String] = Map(
    // q452: inserts at v1/v2 (batches 1 and 2), deletes at v3 (the
    // %37 erasure) — batch 0 is the v0 snapshot, not feed rows
    "q452_change_feed" ->
      (RegistryBase +
        "SELECT * FROM (" +
        "SELECT 1::BIGINT AS version_to, 'insert' AS change_type, " +
        "doc_id, source, n_chars FROM cfb WHERE batch = 1 " +
        "UNION ALL SELECT 2::BIGINT, 'insert', doc_id, source, " +
        "n_chars FROM cfb WHERE batch = 2 " +
        "UNION ALL SELECT 3::BIGINT, 'delete', doc_id, source, " +
        "n_chars FROM cfb WHERE doc_id % 37 = 0) " +
        "ORDER BY version_to, change_type, doc_id"),
    // q453: the OCC schedule as updates with old/new — A's +7 keys at
    // v1, B's +11 keys at v2 (disjoint, so B's old is the base value);
    // aborted C appears nowhere
    "q453_occ_change_feed" ->
      ("WITH cfo AS (SELECT CAST(o_custkey AS BIGINT) AS c_custkey, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1) " +
        "SELECT * FROM (" +
        "SELECT 1::BIGINT AS version_to, 'update' AS change_type, " +
        "c_custkey, n AS old_val, n + 7 AS new_val FROM cfo " +
        "WHERE c_custkey % 3 = 0 " +
        "UNION ALL SELECT 2::BIGINT, 'update', c_custkey, n, n + 11 " +
        "FROM cfo WHERE c_custkey % 3 = 1) " +
        "ORDER BY version_to, c_custkey"),
    // q454: replaying the feed over the v0 snapshot reconstructs the
    // final version — all three batches minus the erased keys
    "q454_change_feed_replay" ->
      (RegistryBase +
        "SELECT doc_id, source, n_chars FROM cfb " +
        "WHERE doc_id % 37 <> 0 ORDER BY doc_id"),
    // q486: stored-vs-diffed parity per feed version — both paths
    // must report the analytic change counts (batch sizes for the
    // insert folds, the %37 request for the erasure), all equal
    "q486_cdf_storage_parity" ->
      (RegistryBase +
        "SELECT * FROM (" +
        "SELECT 1::BIGINT AS version, " +
        "(SELECT COUNT(*) FROM cfb WHERE batch = 1) AS n_stored, " +
        "(SELECT COUNT(*) FROM cfb WHERE batch = 1) AS n_diffed, " +
        "TRUE AS equal " +
        "UNION ALL SELECT 2::BIGINT, " +
        "(SELECT COUNT(*) FROM cfb WHERE batch = 2), " +
        "(SELECT COUNT(*) FROM cfb WHERE batch = 2), TRUE " +
        "UNION ALL SELECT 3::BIGINT, " +
        "(SELECT COUNT(*) FROM cfb WHERE doc_id % 37 = 0), " +
        "(SELECT COUNT(*) FROM cfb WHERE doc_id % 37 = 0), TRUE) " +
        "ORDER BY version"),
    // q498: the net change set v0 → head — inserts that survived the
    // erasure (batches 1–2, % 37 ≠ 0), deletes of v0-resident keys
    // (batch 0, % 37 = 0); insert-then-delete pairs net to nothing
    "q498_cdf_net_changes" ->
      (RegistryBase +
        "SELECT * FROM (" +
        "SELECT 'insert' AS change_type, doc_id, source, n_chars " +
        "FROM cfb WHERE batch >= 1 AND doc_id % 37 <> 0 " +
        "UNION ALL SELECT 'delete', doc_id, source, n_chars " +
        "FROM cfb WHERE batch = 0 AND doc_id % 37 = 0) " +
        "ORDER BY change_type, doc_id"),
    // q516: the feed across a merge must be INDISTINGUISHABLE from
    // the trunk-direct feed — q452's SQL verbatim, because the merge
    // commit declares its changes like every other commit
    "q516_branch_cdf_feed" ->
      (RegistryBase +
        "SELECT * FROM (" +
        "SELECT 1::BIGINT AS version_to, 'insert' AS change_type, " +
        "doc_id, source, n_chars FROM cfb WHERE batch = 1 " +
        "UNION ALL SELECT 2::BIGINT, 'insert', doc_id, source, " +
        "n_chars FROM cfb WHERE batch = 2 " +
        "UNION ALL SELECT 3::BIGINT, 'delete', doc_id, source, " +
        "n_chars FROM cfb WHERE doc_id % 37 = 0) " +
        "ORDER BY version_to, change_type, doc_id"),
    // q517: replaying the branch-aware feed reconstructs the merged
    // head — identical to executing the erasure on the trunk (q493's
    // SQL verbatim)
    "q517_branch_cdf_replay" ->
      ("SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM documents " +
        "WHERE doc_id % 37 <> 0 GROUP BY source ORDER BY source"),
    // q519: the ledger-head OPTIMIZE audit — a rewrite that conserves
    // rows and content, grows no files, and is CDF-silent (its stored
    // change set is empty by declaration)
    "q519_ledger_optimize_audit" ->
      ("SELECT 2::BIGINT AS version_retired, " +
        "3::BIGINT AS version_committed, 2::BIGINT AS batch_id, " +
        "CAST(COUNT(*) AS BIGINT) AS rows_before, " +
        "CAST(COUNT(*) AS BIGINT) AS rows_after, " +
        "TRUE AS content_intact, TRUE AS files_not_increased, " +
        "0::BIGINT AS n_feed_rows FROM documents"),
    // q520: the trail after the rewrite — history untouched, the
    // rewrite carrying the retired version's batch id so AS OF batch
    // 2 resolves to it
    "q520_ledger_optimize_trail" ->
      (RegistryBase +
        ", cfn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nall FROM cfb) " +
        "SELECT * FROM (" +
        "SELECT 0::BIGINT AS version, 0::BIGINT AS batch_id, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM cfb WHERE batch = 0) " +
        "AS n_rows, nall AS n_rows_asof_batch2 FROM cfn " +
        "UNION ALL SELECT 1::BIGINT, 1::BIGINT, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM cfb WHERE batch <= 1)" +
        ", nall FROM cfn " +
        "UNION ALL SELECT 2::BIGINT, 2::BIGINT, nall, nall FROM cfn " +
        "UNION ALL SELECT 3::BIGINT, 2::BIGINT, nall, nall FROM cfn) " +
        "ORDER BY version"))
}
