package graft.oracles

/** DuckDB oracles for the OCC multi-writer commit protocol
  * (q442–q443). The schedule is fixed (A commits, C conflicts with A
  * and aborts, B is disjoint and rebases), so the oracle recomputes
  * every attempt's verdict analytically from the key populations —
  * a protocol bug (lost update, false conflict, missed conflict)
  * changes a count or an outcome string and breaks the hash. CTE
  * prefix `oc` is unique to this family.
  */
object OracleOcc {

  private val Base =
    "WITH ocb AS (SELECT CAST(o_custkey AS BIGINT) AS c_custkey, " +
      "CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1) "

  val sql: Map[String, String] = Map(
    // q442: one row per writer attempt — write-set size, conflicts,
    // verdict, landed version
    "q442_occ_audit" ->
      (Base +
        ", ocn AS (SELECT " +
        "CAST(SUM(CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END) AS " +
        "BIGINT) AS n_a, " +
        "CAST(SUM(CASE WHEN c_custkey % 3 = 1 THEN 1 ELSE 0 END) AS " +
        "BIGINT) AS n_b, " +
        "CAST(SUM(CASE WHEN c_custkey % 6 = 0 THEN 1 ELSE 0 END) AS " +
        "BIGINT) AS n_c FROM ocb) " +
        "SELECT * FROM (" +
        "SELECT 'a' AS writer, 0::BIGINT AS base_version, " +
        "n_a AS n_delta_keys, 0::BIGINT AS n_conflict_keys, " +
        "'committed' AS outcome, 1::BIGINT AS commit_version FROM ocn " +
        "UNION ALL SELECT 'b', 0::BIGINT, n_b, 0::BIGINT, 'rebased', " +
        "2::BIGINT FROM ocn " +
        "UNION ALL SELECT 'c', 0::BIGINT, n_c, n_c, 'aborted', " +
        "(-1)::BIGINT FROM ocn) ORDER BY writer"),
    // q457: stored change sets equal the diff-recovered ones for
    // both committed writer versions (A's %3==0 keys at v1, B's
    // %3==1 keys at v2)
    "q457_occ_changeset_parity" ->
      (Base +
        ", ocn AS (SELECT " +
        "CAST(SUM(CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END) AS " +
        "BIGINT) AS n_a, " +
        "CAST(SUM(CASE WHEN c_custkey % 3 = 1 THEN 1 ELSE 0 END) AS " +
        "BIGINT) AS n_b FROM ocb) " +
        "SELECT * FROM (" +
        "SELECT 1::BIGINT AS version, n_a AS n_stored, n_a AS " +
        "n_diffed, TRUE AS equal FROM ocn " +
        "UNION ALL SELECT 2::BIGINT, n_b, n_b, TRUE FROM ocn) " +
        "ORDER BY version"),
    // q443: the final state is the serial A-then-B application with
    // no trace of aborted C's +1000
    "q443_occ_final_state" ->
      (Base +
        "SELECT c_custkey, n_orders + CASE " +
        "WHEN c_custkey % 3 = 0 THEN 7 " +
        "WHEN c_custkey % 3 = 1 THEN 11 ELSE 0 END AS n_orders " +
        "FROM ocb ORDER BY c_custkey"),
    // q510: the raced census — 7 concurrent writers (6 disjoint
    // classes + 1 duplicate of class 0), so exactly 6 commit, 1
    // aborts, 7 versions land, and the final mass is the base plus
    // every class increment applied exactly once. Analytic under ANY
    // thread interleaving — that invariance is the protocol's claim.
    "q510_occ_race_census" ->
      (Base +
        "SELECT 7::BIGINT AS n_writers, 6::BIGINT AS n_committed, " +
        "1::BIGINT AS n_aborted, 7::BIGINT AS n_versions, " +
        "CAST(COUNT(*) AS BIGINT) AS n_keys_base, " +
        "CAST(COUNT(*) AS BIGINT) AS n_keys_final, " +
        "CAST(SUM(n_orders) AS BIGINT) AS sum_base, " +
        "CAST(SUM(n_orders + (c_custkey % 6 + 1) * 10) AS BIGINT) AS " +
        "sum_final, TRUE AS conserved FROM ocb"),
    // q511: the raced final state at key grain — base + 10·(class+1)
    // on every key, the duplicate's increment applied exactly once
    "q511_occ_race_state" ->
      (Base +
        "SELECT c_custkey, " +
        "n_orders + (c_custkey % 6 + 1) * 10 AS n_orders " +
        "FROM ocb ORDER BY c_custkey"))
}
