package graft.oracles

/** DuckDB oracles for the multi-table atomic commit (q450–q451). The
  * schedule is fixed, so the oracle recomputes each manifest-pinned
  * version's census analytically from the batch populations. CTE
  * prefix `mt` is unique to this family.
  */
object OracleMultiTable {

  private val Base =
    "WITH mto AS (SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS " +
      "o_custkey, o_orderpriority FROM orders), " +
      "mts AS (SELECT (MAX(o_orderkey) + 3) // 3 AS step FROM mto), " +
      "mtb AS (SELECT o.*, o_orderkey // (SELECT step FROM mts) AS " +
      "batch_id FROM mto o), " +
      "mtbase AS (SELECT * FROM mtb WHERE batch_id <= 1) "

  val sql: Map[String, String] = Map(
    // q450: post-recovery manifest trail — txn 0 pins the batch-0–1
    // fold, txn 1 the full fold, for both member tables
    "q450_multitable_manifest" ->
      (Base +
        "SELECT * FROM (" +
        "SELECT 0::BIGINT AS txn_id, 'cnt' AS table_name, " +
        "0::BIGINT AS version, CAST(COUNT(DISTINCT o_custkey) AS " +
        "BIGINT) AS n_rows FROM mtbase " +
        "UNION ALL SELECT 0::BIGINT, 'pri', 0::BIGINT, " +
        "CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM mtbase " +
        "UNION ALL SELECT 1::BIGINT, 'cnt', 1::BIGINT, " +
        "CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM mtb " +
        "UNION ALL SELECT 1::BIGINT, 'pri', 1::BIGINT, " +
        "CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM mtb) " +
        "ORDER BY txn_id, table_name"),
    // q451: the read at the crash point answers from txn 0 for BOTH
    // tables — batch-0–1 aggregates, never the uncommitted full fold
    "q451_multitable_snapshot" ->
      (Base +
        "SELECT * FROM (" +
        "SELECT 'cnt' AS table_name, CAST(COUNT(DISTINCT o_custkey) " +
        "AS BIGINT) AS n_keys, CAST(COUNT(*) AS BIGINT) AS mass " +
        "FROM mtbase " +
        "UNION ALL SELECT 'pri', CAST(COUNT(DISTINCT " +
        "o_orderpriority) AS BIGINT), CAST(COUNT(*) AS BIGINT) " +
        "FROM mtbase) ORDER BY table_name"),
    // q501: the multi-table merge audit — both tables cite txn 1 →
    // txn 2; cnt loses the %97 keys, pri keeps its priorities, both
    // shed exactly the erased customers' order mass
    "q501_multibranch_merge_audit" ->
      (Base +
        "SELECT * FROM (" +
        "SELECT 'cnt' AS table_name, 1::BIGINT AS fork_txn, " +
        "2::BIGINT AS merged_txn, " +
        "CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_rows_fork, " +
        "CAST(COUNT(DISTINCT CASE WHEN o_custkey % 97 <> 0 THEN " +
        "o_custkey END) AS BIGINT) AS n_rows_merged, " +
        "CAST(COUNT(*) AS BIGINT) AS mass_fork, " +
        "CAST(SUM(CASE WHEN o_custkey % 97 <> 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS mass_merged FROM mtb " +
        "UNION ALL SELECT 'pri', 1::BIGINT, 2::BIGINT, " +
        "CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT), " +
        "CAST(COUNT(DISTINCT CASE WHEN o_custkey % 97 <> 0 THEN " +
        "o_orderpriority END) AS BIGINT), " +
        "CAST(COUNT(*) AS BIGINT), " +
        "CAST(SUM(CASE WHEN o_custkey % 97 <> 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) FROM mtb) " +
        "ORDER BY table_name"),
    // q502: the torn-merge read answers from the FORK manifest for
    // both tables — the merge's half-landed versions invisible
    "q502_multibranch_torn_read" ->
      (Base +
        "SELECT * FROM (" +
        "SELECT 'cnt' AS table_name, CAST(COUNT(DISTINCT o_custkey) " +
        "AS BIGINT) AS n_keys, CAST(COUNT(*) AS BIGINT) AS mass " +
        "FROM mtb " +
        "UNION ALL SELECT 'pri', CAST(COUNT(DISTINCT " +
        "o_orderpriority) AS BIGINT), CAST(COUNT(*) AS BIGINT) " +
        "FROM mtb) ORDER BY table_name"))
}
