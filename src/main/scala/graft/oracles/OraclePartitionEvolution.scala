package graft.oracles

/** DuckDB oracles for partition-spec evolution (q459–q460). CTE
  * prefix `pe` is unique to this family.
  */
object OraclePartitionEvolution {

  private val Base =
    "WITH ped AS (SELECT doc_id, source, lang FROM documents), " +
      "pem AS (SELECT MIN(doc_id) AS lo, " +
      "(MAX(doc_id) - MIN(doc_id) + 3) // 3 AS span FROM ped), " +
      "peb AS (SELECT d.*, LEAST((d.doc_id - m.lo) // m.span, 2) AS " +
      "batch_id FROM ped d, pem m), " +
      "pef AS (SELECT batch_id, " +
      "CASE WHEN batch_id <= 1 THEN 0 ELSE 1 END AS spec_id, " +
      "source AS part_source, " +
      "CASE WHEN batch_id <= 1 THEN NULL ELSE lang END AS part_lang, " +
      "CAST(COUNT(*) AS BIGINT) AS n_rows " +
      "FROM peb GROUP BY 1, 2, 3, 4), " +
      "pep AS (SELECT MIN(source) AS p_source, MIN(lang) AS p_lang " +
      "FROM peb) "

  val sql: Map[String, String] = Map(
    // q459: the spec-per-file manifest
    "q459_partition_evolution_manifest" ->
      (Base +
        "SELECT batch_id, CAST(spec_id AS BIGINT) AS spec_id, " +
        "part_source, part_lang, n_rows FROM pef " +
        "ORDER BY batch_id, part_source, part_lang"),
    // q460: mixed-spec pruning — spec-0 batches admit every lang of
    // the probed source, spec-1 prunes both columns
    "q460_partition_evolution_scan" ->
      (Base +
        "SELECT a.batch_id, a.files_scanned, a.rows_scanned, " +
        "COALESCE(m.rows_matched, 0) AS rows_matched FROM (" +
        "SELECT f.batch_id, CAST(COUNT(*) AS BIGINT) AS " +
        "files_scanned, CAST(SUM(f.n_rows) AS BIGINT) AS rows_scanned " +
        "FROM pef f, pep p WHERE f.part_source = p.p_source AND " +
        "(f.part_lang IS NULL OR f.part_lang = p.p_lang) " +
        "GROUP BY f.batch_id) a LEFT JOIN (" +
        "SELECT b.batch_id, CAST(COUNT(*) AS BIGINT) AS rows_matched " +
        "FROM peb b, pep q WHERE b.source = q.p_source AND " +
        "b.lang = q.p_lang GROUP BY b.batch_id) m " +
        "ON a.batch_id = m.batch_id ORDER BY a.batch_id"))
}
