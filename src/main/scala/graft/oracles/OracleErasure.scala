package graft.oracles

/** DuckDB oracles for the erasure / right-to-be-forgotten family
  * (q386–q390).
  *
  * The request is pure arithmetic both engines spell identically:
  * doc_id % 37 == 0 (and vec_id % 37 == 0 on the embedding surface).
  * The executor queries ride the same deterministic 3-batch id-range
  * split as the provenance family, so every batch-dependent fact is
  * the prefix arithmetic of [[OracleProvenance]] plus the erasure
  * predicate; the artifact queries re-derive the banding chain via
  * [[OracleDedup.dupGraphCteBody]] over the full and the retained
  * corpus and pin the exact edge-conservation identity.
  *
  * CTE prefix `ers` is unique to this family.
  */
object OracleErasure {

  private val Mod = 37

  /** lo/hi + per-doc batch assignment (3 splits), shared head. */
  private val ersBatchCtes =
    "ersmm AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi " +
      "FROM documents), " +
      "ersb AS (SELECT d.doc_id, d.source, " +
      "(d.doc_id - m.lo) // ((m.hi - m.lo + 3) // 3) AS b " +
      "FROM documents d, ersmm m)"

  val sql: Map[String, String] = Map(
    // q386: blast radius per surface. dup_edges counts incident
    // verified edges and the RETAINED partner docs whose neighborhood
    // changes
    "q386_erasure_plan" ->
      ("WITH " + OracleDedup.dupGraphCteBody("", "documents") + ", " +
        "ersinc AS (SELECT a, b FROM ed " +
        s"WHERE a % $Mod = 0 OR b % $Mod = 0), " +
        "ersprt AS (SELECT CASE WHEN a % " + Mod + " = 0 THEN b " +
        "ELSE a END AS d FROM ersinc) " +
        "SELECT * FROM (" +
        "SELECT 'documents' AS surface, " +
        "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(COUNT(DISTINCT source) AS BIGINT) AS n_keys " +
        s"FROM documents WHERE doc_id % $Mod = 0 " +
        "UNION ALL SELECT 'embeddings', CAST(COUNT(*) AS BIGINT), " +
        "CAST(COUNT(DISTINCT label) AS BIGINT) " +
        s"FROM embeddings WHERE vec_id % $Mod = 0 " +
        "UNION ALL SELECT 'dup_edges', " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ersinc), " +
        "(SELECT CAST(COUNT(DISTINCT d) AS BIGINT) FROM ersprt " +
        s"WHERE d % $Mod <> 0)" +
        ") ORDER BY surface"),
    // q387: the post-erasure ledger state == the raw table minus the
    // request (per source)
    "q387_erasure_execute" ->
      ("SELECT source, COUNT(*) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM documents " +
        s"WHERE doc_id % $Mod <> 0 GROUP BY source ORDER BY source"),
    // q388: versions 0..2 are cumulative batch prefixes; version 3 is
    // the rewrite — same batch id as the version it retired (2),
    // row count = total minus the request
    "q388_erasure_manifest" ->
      (s"WITH $ersBatchCtes, " +
        "ersv AS (SELECT CAST(v AS BIGINT) AS version FROM " +
        "(VALUES (0), (1), (2), (3)) AS t(v)) " +
        "SELECT ersv.version, " +
        "CAST(CASE WHEN ersv.version = 3 THEN 2 ELSE ersv.version END " +
        "AS BIGINT) AS batch_id, " +
        "CAST(SUM(CASE WHEN (ersv.version < 3 AND ersb.b <= ersv.version) " +
        s"OR (ersv.version = 3 AND ersb.doc_id % $Mod <> 0) " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_rows " +
        "FROM ersv CROSS JOIN ersb " +
        "GROUP BY ersv.version ORDER BY ersv.version"),
    // q389: state == retained and erased fully gone, per source —
    // conserved is identically TRUE on a clean run (the q359 shape)
    "q389_erasure_conservation" ->
      ("SELECT source, " +
        s"CAST(SUM(CASE WHEN doc_id % $Mod <> 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_state, " +
        s"CAST(SUM(CASE WHEN doc_id % $Mod <> 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_retained, " +
        s"CAST(SUM(CASE WHEN doc_id % $Mod = 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_erased, " +
        "TRUE AS conserved FROM documents " +
        "GROUP BY source ORDER BY source"),
    // q428: the q388 version trail with the retention verdict — the
    // batch-prefix versions (0..2, each still holding erased keys)
    // dropped, the rewrite (3) retained; counts are pre-deletion
    "q428_vacuum_manifest" ->
      (s"WITH $ersBatchCtes, " +
        "ersv AS (SELECT CAST(v AS BIGINT) AS version FROM " +
        "(VALUES (0), (1), (2), (3)) AS t(v)) " +
        "SELECT ersv.version, " +
        "CAST(CASE WHEN ersv.version = 3 THEN 2 ELSE ersv.version END " +
        "AS BIGINT) AS batch_id, " +
        "CAST(SUM(CASE WHEN (ersv.version < 3 AND ersb.b <= ersv.version) " +
        s"OR (ersv.version = 3 AND ersb.doc_id % $Mod <> 0) " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_rows, " +
        "(ersv.version = 3) AS retained " +
        "FROM ersv CROSS JOIN ersb " +
        "GROUP BY ersv.version ORDER BY ersv.version"),
    // q429: after erase + vacuum(keepLast=1) exactly ONE version is
    // physically readable — the rewrite, holding the retained rows and
    // zero erased keys. A vacuum that left prior versions on disk
    // surfaces as extra result rows and breaks the compare.
    "q429_vacuum_erasure_audit" ->
      ("SELECT CAST(3 AS BIGINT) AS version, " +
        "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(0 AS BIGINT) AS n_erased_readable " +
        s"FROM documents WHERE doc_id % $Mod <> 0"),
    // q430: the one-request orchestrator certificate — every surface's
    // expectation recomputed independently (including BOTH capped
    // banding chains for the artifact row and the q410/q411 view
    // recomputes), so one surviving erased row anywhere breaks the
    // hash. Subject set: key % 97 == 0 per surface key domain.
    // Prefix `orc` is unique to this row.
    "q430_erasure_certificate" ->
      ("WITH " + OracleDedup.dupGraphCteBodyCapped("orca", "documents") +
        ", orcbase AS (SELECT * FROM documents WHERE doc_id % 97 <> 0), " +
        OracleDedup.dupGraphCteBodyCapped("orcb", "orcbase") + ", " +
        "orcli AS (SELECT * FROM lineitem WHERE l_orderkey NOT IN " +
        "(SELECT o_orderkey FROM orders WHERE o_custkey % 97 = 0)), " +
        "orcoba AS (SELECT DISTINCT l_orderkey, p_brand FROM lineitem l " +
        "JOIN part p ON p.p_partkey = l.l_partkey), " +
        "orcobr AS (SELECT DISTINCT l_orderkey, p_brand FROM orcli l " +
        "JOIN part p ON p.p_partkey = l.l_partkey), " +
        "orcpa AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM " +
        "(SELECT DISTINCT a.p_brand AS ba, b.p_brand AS bb FROM orcoba a " +
        "JOIN orcoba b ON a.l_orderkey = b.l_orderkey " +
        "AND a.p_brand < b.p_brand) AS pa), " +
        "orcpr AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM " +
        "(SELECT DISTINCT a.p_brand AS ba, b.p_brand AS bb FROM orcobr a " +
        "JOIN orcobr b ON a.l_orderkey = b.l_orderkey " +
        "AND a.p_brand < b.p_brand) AS pr), " +
        "orcca AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM " +
        "(SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem " +
        "WHERE l_shipdate <= TIMESTAMP '2001-09-02') AS ca), " +
        "orccr AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM " +
        "(SELECT DISTINCT l_returnflag, l_linestatus FROM orcli " +
        "WHERE l_shipdate <= TIMESTAMP '2001-09-02') AS cr) " +
        "SELECT * FROM (" +
        "SELECT 'documents' AS surface, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM documents " +
        "WHERE doc_id % 97 <> 0) AS n_state, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM documents " +
        "WHERE doc_id % 97 <> 0) AS n_retained, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM documents " +
        "WHERE doc_id % 97 = 0) AS n_erased, TRUE AS conserved " +
        "UNION ALL SELECT 'events', " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM events " +
        "WHERE user_id % 97 <> 0), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM events " +
        "WHERE user_id % 97 <> 0), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM events " +
        "WHERE user_id % 97 = 0), TRUE " +
        "UNION ALL SELECT 'ann_lists', " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings " +
        "WHERE vec_id % 97 <> 0), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings " +
        "WHERE vec_id % 97 <> 0), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings " +
        "WHERE vec_id % 97 = 0), TRUE " +
        "UNION ALL SELECT 'dup_edges', " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM orcbed), " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM orcaed) - " +
        "(SELECT CAST(COALESCE(SUM(CASE WHEN a % 97 = 0 OR b % 97 = 0 " +
        "THEN 1 ELSE 0 END), 0) AS BIGINT) FROM orcaed), " +
        "(SELECT CAST(COALESCE(SUM(CASE WHEN a % 97 = 0 OR b % 97 = 0 " +
        "THEN 1 ELSE 0 END), 0) AS BIGINT) FROM orcaed), TRUE " +
        "UNION ALL SELECT 'pricing_cells', " +
        "(SELECT c FROM orccr), (SELECT c FROM orccr), " +
        "(SELECT c FROM orcca) - (SELECT c FROM orccr), TRUE " +
        "UNION ALL SELECT 'brand_affinity', " +
        "(SELECT c FROM orcpr), (SELECT c FROM orcpr), " +
        "(SELECT c FROM orcpa) - (SELECT c FROM orcpr), TRUE" +
        ") AS orcall ORDER BY surface"),
    // q390: banding signatures are per-doc, so removing docs removes
    // exactly the edges incident to them — the rebuilt artifact obeys
    // after == before − incident(before), and no surviving edge
    // touches an erased doc
    "q390_erasure_artifact_rebuild" ->
      ("WITH " + OracleDedup.dupGraphCteBody("", "documents") + ", " +
        "ersbase AS (SELECT * FROM documents " +
        s"WHERE doc_id % $Mod <> 0), " +
        OracleDedup.dupGraphCteBody("ers", "ersbase") + ", " +
        "ersx AS (SELECT " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ed) AS n_edges_before, " +
        "(SELECT CAST(COALESCE(SUM(CASE WHEN a % " + Mod +
        s" = 0 OR b % $Mod = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) " +
        "FROM ed) AS n_incident_before, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ersed) AS n_edges_after, " +
        "(SELECT CAST(COALESCE(SUM(CASE WHEN a % " + Mod +
        s" = 0 OR b % $Mod = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) " +
        "FROM ersed) AS n_incident_after) " +
        "SELECT n_edges_before, n_incident_before, n_edges_after, " +
        "n_incident_after, " +
        "(n_edges_after = n_edges_before - n_incident_before) " +
        "AS conserved FROM ersx"),
    // q499: the orphan audit — three committed batch prefixes, the
    // planted markerless strand (a v0 copy), the planted stray file
    "q499_orphan_audit" ->
      ("WITH orpm AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi " +
        "FROM documents), " +
        "orpd AS (SELECT LEAST((d.doc_id - m.lo) // " +
        "((m.hi - m.lo + 3) // 3), 2) AS b FROM documents d, orpm m) " +
        "SELECT * FROM (" +
        "SELECT 'b0_0' AS entry, 'committed_version' AS kind, " +
        "CAST((SELECT COUNT(*) FROM orpd WHERE b = 0) AS BIGINT) " +
        "AS n_rows " +
        "UNION ALL SELECT 'b1_1', 'committed_version', " +
        "CAST((SELECT COUNT(*) FROM orpd WHERE b <= 1) AS BIGINT) " +
        "UNION ALL SELECT 'b2_2', 'committed_version', " +
        "CAST((SELECT COUNT(*) FROM orpd) AS BIGINT) " +
        "UNION ALL SELECT 'b9_9', 'orphan_uncommitted', " +
        "CAST((SELECT COUNT(*) FROM orpd WHERE b = 0) AS BIGINT) " +
        "UNION ALL SELECT 'tmp_export_stray', 'orphan_foreign', " +
        "0::BIGINT) ORDER BY entry"),
    // q500: post-GC — orphans gone, committed versions intact
    "q500_orphan_gc_state" ->
      ("WITH orpm AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi " +
        "FROM documents), " +
        "orpd AS (SELECT LEAST((d.doc_id - m.lo) // " +
        "((m.hi - m.lo + 3) // 3), 2) AS b FROM documents d, orpm m) " +
        "SELECT * FROM (" +
        "SELECT 'b0_0' AS entry, 'committed_version' AS kind, " +
        "CAST((SELECT COUNT(*) FROM orpd WHERE b = 0) AS BIGINT) " +
        "AS n_rows " +
        "UNION ALL SELECT 'b1_1', 'committed_version', " +
        "CAST((SELECT COUNT(*) FROM orpd WHERE b <= 1) AS BIGINT) " +
        "UNION ALL SELECT 'b2_2', 'committed_version', " +
        "CAST((SELECT COUNT(*) FROM orpd) AS BIGINT)) " +
        "ORDER BY entry"))
}
