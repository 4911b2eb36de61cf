package graft.oracles

/** DuckDB oracles for export integrity + hash-chained trails
  * (q483–q485). The additive checksum decodes ten md5 hex nibbles by
  * strpos (Spark computes the identical value via
  * `conv(substring(md5,1,10),16,10)`); the chain is the unrolled
  * 3-version md5 fold. CTE prefix `ig`.
  */
object OracleIntegrity {

  private val Base =
    "WITH igd AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS " +
      "n_chars, LEAST((doc_id - (SELECT MIN(doc_id) FROM documents)) " +
      "// ((SELECT MAX(doc_id) - MIN(doc_id) + 3 FROM documents) // " +
      "3), 2) AS batch FROM documents), " +
      "igh AS (SELECT batch, list_sum(list_transform(range(1, 11), " +
      "i -> (strpos('0123456789abcdef', substr(md5(concat_ws('|', " +
      "doc_id, source, n_chars)), CAST(i AS INT), 1)) - 1) * " +
      "(1::BIGINT << CAST(4 * (10 - i) AS INT)))) AS h FROM igd), " +
      "igm AS (SELECT v.version, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
      "CAST(SUM(h.h) AS BIGINT) AS checksum FROM " +
      "(VALUES (0::BIGINT), (1::BIGINT), (2::BIGINT)) v(version) " +
      "JOIN igh h ON h.batch <= v.version GROUP BY v.version) "

  val sql: Map[String, String] = Map(
    // q483: per-version rows + additive content checksum
    "q483_export_manifest" ->
      (Base +
        "SELECT version, n_rows, checksum FROM igm ORDER BY version"),
    // q484: manifest vs restore recompute — identical by construction
    // in the oracle; a Spark-side restore drift breaks the hash
    "q484_restore_parity" ->
      (Base +
        "SELECT version, n_rows, n_rows AS n_rows_restored, checksum, " +
        "checksum AS checksum_restored, TRUE AS intact FROM igm " +
        "ORDER BY version"),
    // q485: the md5 hash chain over the version trail
    "q485_ledger_hash_chain" ->
      (Base +
        ", ign AS (SELECT " +
        "(SELECT COUNT(*) FROM igd WHERE batch <= 0) AS n0, " +
        "(SELECT COUNT(*) FROM igd WHERE batch <= 1) AS n1, " +
        "(SELECT COUNT(*) FROM igd) AS n2), " +
        "igc AS (SELECT n0, n1, n2, " +
        "md5('graft|0|' || CAST(n0 AS VARCHAR)) AS c0 FROM ign), " +
        "igc2 AS (SELECT *, md5(c0 || '|1|' || CAST(n1 AS VARCHAR)) " +
        "AS c1 FROM igc), " +
        "igc3 AS (SELECT *, md5(c1 || '|2|' || CAST(n2 AS VARCHAR)) " +
        "AS c2 FROM igc2) " +
        "SELECT * FROM (" +
        "SELECT 0::BIGINT AS version, CAST(n0 AS BIGINT) AS n_rows, " +
        "c0 AS chain FROM igc3 " +
        "UNION ALL SELECT 1::BIGINT, CAST(n1 AS BIGINT), c1 FROM igc3 " +
        "UNION ALL SELECT 2::BIGINT, CAST(n2 AS BIGINT), c2 FROM " +
        "igc3) ORDER BY version"),
    // q503: the restore executor — the restored trail's chain must
    // equal the source's link by link (same versions, same order,
    // same counts); the oracle recomputes the one true chain
    "q503_restore_executor" ->
      (Base +
        ", ign AS (SELECT " +
        "(SELECT COUNT(*) FROM igd WHERE batch <= 0) AS n0, " +
        "(SELECT COUNT(*) FROM igd WHERE batch <= 1) AS n1, " +
        "(SELECT COUNT(*) FROM igd) AS n2), " +
        "igc AS (SELECT n0, n1, n2, " +
        "md5('graft|0|' || CAST(n0 AS VARCHAR)) AS c0 FROM ign), " +
        "igc2 AS (SELECT *, md5(c0 || '|1|' || CAST(n1 AS VARCHAR)) " +
        "AS c1 FROM igc), " +
        "igc3 AS (SELECT *, md5(c1 || '|2|' || CAST(n2 AS VARCHAR)) " +
        "AS c2 FROM igc2) " +
        "SELECT * FROM (" +
        "SELECT 0::BIGINT AS version, CAST(n0 AS BIGINT) AS n_rows, " +
        "c0 AS chain_source, c0 AS chain_restored, TRUE AS intact " +
        "FROM igc3 " +
        "UNION ALL SELECT 1::BIGINT, CAST(n1 AS BIGINT), c1, c1, " +
        "TRUE FROM igc3 " +
        "UNION ALL SELECT 2::BIGINT, CAST(n2 AS BIGINT), c2, c2, " +
        "TRUE FROM igc3) ORDER BY version"),
    // q515: PITR to version 1 — the truncated trail's chain equals
    // the source prefix link by link; exactly two versions restored
    "q515_pitr_restore" ->
      (Base +
        ", ign AS (SELECT " +
        "(SELECT COUNT(*) FROM igd WHERE batch <= 0) AS n0, " +
        "(SELECT COUNT(*) FROM igd WHERE batch <= 1) AS n1), " +
        "igc AS (SELECT n0, n1, " +
        "md5('graft|0|' || CAST(n0 AS VARCHAR)) AS c0 FROM ign), " +
        "igc2 AS (SELECT *, md5(c0 || '|1|' || CAST(n1 AS VARCHAR)) " +
        "AS c1 FROM igc) " +
        "SELECT * FROM (" +
        "SELECT 0::BIGINT AS version, CAST(n0 AS BIGINT) AS n_rows, " +
        "c0 AS chain_source, c0 AS chain_restored, TRUE AS intact, " +
        "2::BIGINT AS n_versions_restored FROM igc2 " +
        "UNION ALL SELECT 1::BIGINT, CAST(n1 AS BIGINT), c1, c1, " +
        "TRUE, 2::BIGINT FROM igc2) ORDER BY version"),
    // q518: multi-tenant bundles — per (role, region), rows + the
    // additive checksum over each role's OWN masked bytes (tokenized
    // name for eu, NULL-redacted balance for na — concat_ws skips the
    // NULL identically in both engines)
    "q518_governed_export_bundles" ->
      ("WITH igcu AS (SELECT c_custkey, c_name, " +
        "CAST(n_regionkey AS BIGINT) AS region, " +
        "CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey), " +
        "igbr AS (" +
        "SELECT 'admin' AS role, c_custkey, c_name AS name_out, " +
        "region, CAST(cents AS VARCHAR) AS bal_s FROM igcu " +
        "UNION ALL SELECT 'analyst_eu', c_custkey, " +
        "md5('nm|' || CAST(c_custkey AS VARCHAR)), region, " +
        "CAST(cents AS VARCHAR) FROM igcu WHERE region IN (0, 1) " +
        "UNION ALL SELECT 'analyst_na', c_custkey, c_name, region, " +
        "NULL FROM igcu WHERE region = 2), " +
        "igbh AS (SELECT role, region, " +
        "list_sum(list_transform(range(1, 11), i -> (strpos(" +
        "'0123456789abcdef', substr(md5(concat_ws('|', " +
        "CAST(c_custkey AS VARCHAR), name_out, " +
        "CAST(region AS VARCHAR), bal_s)), CAST(i AS INT), 1)) - 1) " +
        "* (1::BIGINT << CAST(4 * (10 - i) AS INT)))) AS h " +
        "FROM igbr) " +
        "SELECT role, region, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(SUM(h) AS BIGINT) AS checksum FROM igbh " +
        "GROUP BY role, region ORDER BY role, region"),
    // q506: the governed release bundle — per region, rows + additive
    // checksum over the MASKED release rows (tokenized name included)
    "q506_governed_export" ->
      ("WITH igrel AS (SELECT c_custkey, " +
        "md5('nm|' || CAST(c_custkey AS VARCHAR)) AS name_token, " +
        "CAST(n_regionkey AS BIGINT) AS region, " +
        "CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE n_regionkey IN (0, 1)), " +
        "igrh AS (SELECT region, list_sum(list_transform(range(1, 11)" +
        ", i -> (strpos('0123456789abcdef', substr(md5(" +
        "CAST(c_custkey AS VARCHAR) || '|' || name_token || '|' || " +
        "CAST(region AS VARCHAR) || '|' || " +
        "CAST(acctbal_cents AS VARCHAR)), CAST(i AS INT), 1)) - 1) * " +
        "(1::BIGINT << CAST(4 * (10 - i) AS INT)))) AS h FROM igrel) " +
        "SELECT region, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(SUM(h) AS BIGINT) AS checksum FROM igrh " +
        "GROUP BY region ORDER BY region"))
}
