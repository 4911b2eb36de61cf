package graft.oracles

/** DuckDB oracles for the ledger schema-evolution family (q431–q432).
  *
  * Everything is the deterministic 3-batch id-range split arithmetic
  * (the q388 head) plus the planted drift rule: batches ≥ 1 carry
  * `rev = doc_id % 5`. Versions are the cumulative batch prefixes;
  * version 0 has 3 columns (schema version 1), versions 1–2 have 4
  * (schema version 2).
  *
  * CTE prefix `sev` is unique to this family.
  */
object OracleSchemaEvolution {

  private val sevBatchCtes =
    "sevmm AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi " +
      "FROM documents), " +
      "sevb AS (SELECT d.doc_id, d.source, " +
      "(d.doc_id - m.lo) // ((m.hi - m.lo + 3) // 3) AS b " +
      "FROM documents d, sevmm m)"

  val sql: Map[String, String] = Map(
    // q431: version/schema trail — n_rows are the batch-prefix
    // cumulative counts; the column count steps 3 → 4 at version 1 and
    // the schema version increments exactly there
    "q431_schema_evolution_manifest" ->
      (s"WITH $sevBatchCtes, " +
        "sevv AS (SELECT CAST(v AS BIGINT) AS version FROM " +
        "(VALUES (0), (1), (2)) AS t(v)) " +
        "SELECT sevv.version, sevv.version AS batch_id, " +
        "CAST(SUM(CASE WHEN sevb.b <= sevv.version THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_rows, " +
        "CAST(CASE WHEN sevv.version = 0 THEN 3 ELSE 4 END AS BIGINT) " +
        "AS n_cols, " +
        "CAST(CASE WHEN sevv.version = 0 THEN 1 ELSE 2 END AS BIGINT) " +
        "AS schema_version " +
        "FROM sevv CROSS JOIN sevb " +
        "GROUP BY sevv.version ORDER BY sevv.version"),
    // q432: the widened state per source — rows from batches ≥ 1 carry
    // rev = doc_id % 5, version-0 rows backfill NULL (counted out of
    // both n_with_rev and sum_rev)
    "q432_schema_evolution_drain" ->
      (s"WITH $sevBatchCtes " +
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(CASE WHEN b >= 1 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_with_rev, " +
        "CAST(SUM(CASE WHEN b >= 1 THEN doc_id % 5 ELSE 0 END) " +
        "AS BIGINT) AS sum_rev " +
        "FROM sevb GROUP BY source ORDER BY source"),
    // q489: rename+widen manifest — versions 0–1 store n_chars as
    // int (never rewritten), version 2 commits bigint; the declared
    // src→source rename fires on batches 1 and 2 only
    "q489_schema_rename_widen_manifest" ->
      (s"WITH $sevBatchCtes, " +
        "sevv AS (SELECT CAST(v AS BIGINT) AS version FROM " +
        "(VALUES (0), (1), (2)) AS t(v)) " +
        "SELECT sevv.version, sevv.version AS batch_id, " +
        "CAST(SUM(CASE WHEN sevb.b <= sevv.version THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_rows, " +
        "CASE WHEN sevv.version = 2 THEN 'bigint' ELSE 'int' END " +
        "AS n_chars_type, " +
        "CAST(CASE WHEN sevv.version = 0 THEN 0 ELSE 1 END AS BIGINT) " +
        "AS n_renamed_cols " +
        "FROM sevv CROSS JOIN sevb " +
        "GROUP BY sevv.version ORDER BY sevv.version"),
    // q490: rename+widen drain parity — the head state equals the raw
    // table per source (no rows lost to the rename, no values lost to
    // the int→long widening)
    "q490_schema_rename_widen_drain" ->
      ("SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars " +
        "FROM documents GROUP BY source ORDER BY source"))
}
