package graft.oracles

/** DuckDB oracles for deletion vectors (q463–q465). CTE prefix `dv`
  * is unique to this family.
  */
object OracleDeletionVectors {

  private val Base =
    "WITH dvf AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS " +
      "n_chars, (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // 256 AS " +
      "file_id FROM documents) "

  val sql: Map[String, String] = Map(
    // q463: per touched file after the %37 request
    "q463_dv_census" ->
      (Base +
        "SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(SUM(CASE WHEN doc_id % 37 = 0 THEN 1 ELSE 0 END) AS " +
        "BIGINT) AS n_deleted, " +
        "CAST(COUNT(*) - SUM(CASE WHEN doc_id % 37 = 0 THEN 1 ELSE 0 " +
        "END) AS BIGINT) AS live_rows " +
        "FROM dvf GROUP BY file_id " +
        "HAVING SUM(CASE WHEN doc_id % 37 = 0 THEN 1 ELSE 0 END) > 0 " +
        "ORDER BY file_id"),
    // q464: merge-on-read == direct complement filter, per source
    "q464_dv_read_parity" ->
      (Base +
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM dvf " +
        "WHERE doc_id % 37 <> 0 GROUP BY source ORDER BY source"),
    // q478: per-file rewrite-vs-carry decision at the 7-delete bar
    "q478_dv_compaction_plan" ->
      ("WITH dvo AS (SELECT o_orderkey, (ROW_NUMBER() OVER (ORDER BY " +
        "o_orderkey) - 1) // 256 AS file_id FROM orders), " +
        "dvp AS (SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(SUM(CASE WHEN o_orderkey % 37 = 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_deleted FROM dvo GROUP BY file_id " +
        "HAVING SUM(CASE WHEN o_orderkey % 37 = 0 THEN 1 ELSE 0 END) " +
        "> 0) " +
        "SELECT file_id, n_rows, n_deleted, CASE WHEN n_deleted >= 7 " +
        "THEN 'rewrite' ELSE 'carry' END AS action FROM dvp " +
        "ORDER BY file_id"),
    // q479: post-compaction: rewritten files shrink and drop the DV,
    // carried files keep both; live rows invariant
    "q479_dv_compaction_state" ->
      ("WITH dvo AS (SELECT o_orderkey, (ROW_NUMBER() OVER (ORDER BY " +
        "o_orderkey) - 1) // 256 AS file_id FROM orders), " +
        "dvp AS (SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(SUM(CASE WHEN o_orderkey % 37 = 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_deleted FROM dvo GROUP BY file_id " +
        "HAVING SUM(CASE WHEN o_orderkey % 37 = 0 THEN 1 ELSE 0 END) " +
        "> 0) " +
        "SELECT file_id, CASE WHEN n_deleted >= 7 THEN n_rows - " +
        "n_deleted ELSE n_rows END AS stored_rows, " +
        "CASE WHEN n_deleted >= 7 THEN 0 ELSE n_deleted END AS " +
        "dv_remaining, n_rows - n_deleted AS live_rows FROM dvp " +
        "ORDER BY file_id"),
    // q465: merged vectors == one-shot combined predicate
    "q465_dv_merge_census" ->
      (Base +
        "SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(SUM(CASE WHEN doc_id % 37 = 0 OR doc_id % 41 = 0 THEN " +
        "1 ELSE 0 END) AS BIGINT) AS n_deleted, " +
        "CAST(COUNT(*) - SUM(CASE WHEN doc_id % 37 = 0 OR doc_id % " +
        "41 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS live_rows " +
        "FROM dvf GROUP BY file_id " +
        "HAVING SUM(CASE WHEN doc_id % 37 = 0 OR doc_id % 41 = 0 " +
        "THEN 1 ELSE 0 END) > 0 ORDER BY file_id"),
    // q505: epoch-pinned merge-on-read reads — per (epoch, source)
    // live census: epoch 0 all rows, 1 after %37, 2 after %37∪%41
    "q505_dv_asof_census" ->
      ("SELECT * FROM (" +
        "SELECT 0::BIGINT AS epoch, source, CAST(COUNT(*) AS BIGINT) " +
        "AS n_docs FROM documents GROUP BY source " +
        "UNION ALL SELECT 1::BIGINT, source, CAST(COUNT(*) AS BIGINT) " +
        "FROM documents WHERE doc_id % 37 <> 0 GROUP BY source " +
        "UNION ALL SELECT 2::BIGINT, source, CAST(COUNT(*) AS BIGINT) " +
        "FROM documents WHERE doc_id % 37 <> 0 AND doc_id % 41 <> 0 " +
        "GROUP BY source) ORDER BY epoch, source"))
}
