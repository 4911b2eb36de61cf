package graft.oracles

/** DuckDB oracles for the lineage/provenance family (q355–q359).
  *
  * The probe pipeline's batching is arithmetic the oracle reproduces
  * exactly: [[graft.streaming.StreamingOps.idRangeSplitSource]] splits
  * `documents` into 3 id-range files with pinned ascending mtimes, so
  * micro-batch k = doc_ids with `(doc_id − lo) // span = k`,
  * `span = (hi − lo + 3) // 3`, and a fresh checkpoint numbers batches
  * 0,1,2 — version v of the ledger therefore holds exactly batches
  * 0..v (the cumulative prefix). Every query below is that prefix
  * arithmetic plus the family's own rollup.
  *
  * CTE prefix `linp` is unique to this family (shared-prefix hygiene —
  * the q325 collision lesson).
  */
object OracleProvenance {

  /** lo/hi/span + per-doc batch assignment — the shared head. */
  private val linpBatchCtes =
    "linpmm AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi " +
      "FROM documents), " +
      "linpb AS (SELECT d.source, " +
      "(d.doc_id - m.lo) // ((m.hi - m.lo + 3) // 3) AS b " +
      "FROM documents d, linpmm m)"

  val sql: Map[String, String] = Map(
    // q355: one row per ledger version — version v = batches 0..v,
    // so n_sources/n_docs are prefix rollups
    "q355_lineage_manifest" ->
      (s"WITH $linpBatchCtes, " +
        "linpv AS (SELECT CAST(v AS BIGINT) AS version FROM " +
        "(VALUES (0), (1), (2)) AS t(v)) " +
        "SELECT linpv.version, linpv.version AS batch_id, " +
        "CAST(COUNT(DISTINCT CASE WHEN linpb.b <= linpv.version " +
        "THEN linpb.source END) AS BIGINT) AS n_sources, " +
        "CAST(SUM(CASE WHEN linpb.b <= linpv.version THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_docs " +
        "FROM linpv CROSS JOIN linpb " +
        "GROUP BY linpv.version ORDER BY linpv.version"),
    // q356: first batch that introduced each source key = min batch
    // over its docs (batches arrive in id order)
    "q356_first_writer_provenance" ->
      (s"WITH $linpBatchCtes " +
        "SELECT source, CAST(MIN(b) AS BIGINT) AS first_batch, " +
        "COUNT(*) AS n_docs FROM linpb " +
        "GROUP BY source ORDER BY source"),
    // q357: q345's report body + the binding columns — the final
    // version is 2 and it folded batch 2 (3 deterministic batches)
    "q357_report_lineage_binding" ->
      ("SELECT linpr.*, CAST(2 AS BIGINT) AS state_version, " +
        "CAST(2 AS BIGINT) AS state_batch FROM (" +
        OracleText.piiIncidenceSql + ") linpr ORDER BY source"),
    // q358: version 1 = batches 0..1 — the same report with the
    // prefix predicate
    "q358_state_asof_version" ->
      (s"WITH $linpBatchCtes " +
        "SELECT source, COUNT(*) AS n_docs FROM linpb " +
        "WHERE b <= 1 GROUP BY source ORDER BY source"),
    // q359: conservation — the final state holds every ingested doc,
    // so both sides equal the raw per-source count
    "q359_lineage_conservation" ->
      ("SELECT source, COUNT(*) AS n_state, COUNT(*) AS n_raw, " +
        "TRUE AS conserved FROM documents " +
        "GROUP BY source ORDER BY source"))
}
