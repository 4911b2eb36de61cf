package graft.oracles

/** DuckDB oracle for the dataset card (q422): a union of the home
  * families' exact spellings over one snapshot. CTE prefix `dcd`.
  */
object OracleCard {

  private def splitByte(idExpr: String): String =
    s"(strpos('0123456789abcdef', substr(md5('split|' || " +
      s"CAST($idExpr AS VARCHAR)), 1, 1)) - 1) * 16 + " +
      s"strpos('0123456789abcdef', substr(md5('split|' || " +
      s"CAST($idExpr AS VARCHAR)), 2, 1)) - 1"

  val sql: Map[String, String] = Map(
    "q422_dataset_card" ->
      ("WITH dcdt AS (SELECT doc_id, text, lang, source, n_chars, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
        OracleContamination.ctmBase + " " +
        "SELECT * FROM (" +
        "SELECT 'n_docs' AS fact, CAST(COUNT(*) AS BIGINT) AS value " +
        "FROM dcdt " +
        "UNION ALL SELECT 'n_tokens', CAST(SUM(len(toks)) AS BIGINT) " +
        "FROM dcdt " +
        "UNION ALL SELECT 'n_chars', CAST(SUM(n_chars) AS BIGINT) " +
        "FROM dcdt " +
        "UNION ALL SELECT 'n_sources', " +
        "CAST(COUNT(DISTINCT source) AS BIGINT) FROM dcdt " +
        "UNION ALL SELECT 'n_langs', " +
        "CAST(COUNT(DISTINCT lang) AS BIGINT) FROM dcdt " +
        "UNION ALL SELECT 'n_quality_pass', " +
        "CAST(SUM(CASE WHEN len(toks) >= 20 AND " +
        "CAST(len(list_distinct(toks)) AS DOUBLE) / " +
        "CAST(len(toks) AS DOUBLE) > 0.1 AND " +
        "CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) " +
        "AS DOUBLE) / CAST(len(toks) AS DOUBLE) < 0.5 " +
        "THEN 1 ELSE 0 END) AS BIGINT) FROM dcdt " +
        "UNION ALL SELECT 'n_exact_dup_docs', " +
        "CAST(COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END), 0) " +
        "AS BIGINT) FROM (SELECT md5(text) AS h, COUNT(*) AS cnt " +
        "FROM documents GROUP BY md5(text)) dcdd " +
        "UNION ALL SELECT 'n_split_' || split, " +
        "CAST(COUNT(*) AS BIGINT) FROM (SELECT CASE WHEN " +
        splitByte("doc_id") + " < 204 THEN 'train' WHEN " +
        splitByte("doc_id") + " < 230 THEN 'val' ELSE 'test' END " +
        "AS split FROM documents) dcds GROUP BY split " +
        "UNION ALL SELECT 'n_pii_docs', " +
        "CAST(SUM(n_docs_pii) AS BIGINT) FROM (" +
        OracleText.piiIncidenceSql + ") dcdp " +
        "UNION ALL SELECT 'n_contaminated_train', " +
        "CAST(SUM(CASE WHEN ctmr.doc_id IS NOT NULL THEN 1 ELSE 0 END) " +
        "AS BIGINT) FROM ctmf f LEFT JOIN ctmr " +
        "ON f.doc_id = ctmr.doc_id WHERE f.split = 'train'" +
        ") ORDER BY fact"),
    // q438: the card facts at the previous snapshot (batches 0..1 of
    // the 3-batch id-range split — ledger version 1's content) vs the
    // current corpus, per-fact delta. Prefix `dcf`.
    "q438_dataset_card_diff" ->
      ("WITH dcfmm AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi " +
        "FROM documents), " +
        "dcfbase AS (SELECT d.* FROM documents d, dcfmm m " +
        "WHERE (d.doc_id - m.lo) // ((m.hi - m.lo + 3) // 3) <= 1), " +
        "dcfat AS (SELECT doc_id, text, lang, source, n_chars, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM dcfbase), " +
        "dcfbt AS (SELECT doc_id, text, lang, source, n_chars, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
        "dcfx AS (" + cardFactsSql("dcfat", "dcfbase") + "), " +
        "dcfy AS (" + cardFactsSql("dcfbt", "documents") + ") " +
        "SELECT fact, " +
        "CAST(COALESCE(x.value, 0) AS BIGINT) AS value_prev, " +
        "CAST(COALESCE(y.value, 0) AS BIGINT) AS value_curr, " +
        "CAST(COALESCE(y.value, 0) - COALESCE(x.value, 0) AS BIGINT) " +
        "AS delta " +
        "FROM dcfx x FULL JOIN dcfy y USING (fact) ORDER BY fact"))

  /** The snapshot-parameterized card facts (the q422 spellings over an
    * arbitrary tokenized CTE `t` and its base relation) — shared by
    * the card and the diff.
    */
  private def cardFactsSql(t: String, base: String): String =
    s"SELECT 'n_docs' AS fact, CAST(COUNT(*) AS BIGINT) AS value " +
      s"FROM $t " +
      s"UNION ALL SELECT 'n_tokens', CAST(SUM(len(toks)) AS BIGINT) " +
      s"FROM $t " +
      s"UNION ALL SELECT 'n_chars', CAST(SUM(n_chars) AS BIGINT) " +
      s"FROM $t " +
      "UNION ALL SELECT 'n_sources', " +
      s"CAST(COUNT(DISTINCT source) AS BIGINT) FROM $t " +
      "UNION ALL SELECT 'n_langs', " +
      s"CAST(COUNT(DISTINCT lang) AS BIGINT) FROM $t " +
      "UNION ALL SELECT 'n_quality_pass', " +
      "CAST(SUM(CASE WHEN len(toks) >= 20 AND " +
      "CAST(len(list_distinct(toks)) AS DOUBLE) / " +
      "CAST(len(toks) AS DOUBLE) > 0.1 AND " +
      "CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) " +
      "AS DOUBLE) / CAST(len(toks) AS DOUBLE) < 0.5 " +
      s"THEN 1 ELSE 0 END) AS BIGINT) FROM $t " +
      "UNION ALL SELECT 'n_exact_dup_docs', " +
      "CAST(COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END), 0) " +
      "AS BIGINT) FROM (SELECT md5(text) AS h, COUNT(*) AS cnt " +
      s"FROM $base GROUP BY md5(text)) ${t}d " +
      "UNION ALL SELECT 'n_split_' || split, " +
      "CAST(COUNT(*) AS BIGINT) FROM (SELECT CASE WHEN " +
      splitByte("doc_id") + " < 204 THEN 'train' WHEN " +
      splitByte("doc_id") + " < 230 THEN 'val' ELSE 'test' END " +
      s"AS split FROM $base) ${t}s GROUP BY split"
}
