package graft.oracles

/** DuckDB oracles for the cross-split n-gram contamination family
  * (q412–q415).
  *
  * Splits are the q136/q220 md5-byte rule (80/10/10 on
  * "split|doc_id"); windows are the q174 15-token md5 machinery; the
  * purge reassembly is q174's kept-index filter. q415 shares q414's
  * SQL (the cells sum-merge against a fixed test set).
  *
  * CTE prefix `ctm` is unique to this family.
  */
object OracleContamination {

  private def splitByte(idExpr: String): String =
    s"(strpos('0123456789abcdef', substr(md5('split|' || " +
      s"CAST($idExpr AS VARCHAR)), 1, 1)) - 1) * 16 + " +
      s"strpos('0123456789abcdef', substr(md5('split|' || " +
      s"CAST($idExpr AS VARCHAR)), 2, 1)) - 1"

  /** Tokenized + split docs, windows, and the test window set. Also
    * read by the q422 dataset card (contamination fact).
    */
  private[oracles] val ctmBase =
    "ctmt AS (SELECT doc_id, source, " +
      "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
      "AS toks FROM documents), " +
      "ctmf AS (SELECT doc_id, source, toks, " +
      s"CASE WHEN ${splitByte("doc_id")} < 204 THEN 'train' " +
      s"WHEN ${splitByte("doc_id")} < 230 THEN 'val' " +
      "ELSE 'test' END AS split FROM ctmt WHERE len(toks) > 0), " +
      "ctmw AS (SELECT doc_id, split, p AS pos, " +
      "md5(array_to_string(toks[p+1:p+15], ' ')) AS wh " +
      "FROM (SELECT doc_id, split, toks, " +
      "unnest(range(0, len(toks) - 14)) AS p " +
      "FROM ctmf WHERE len(toks) >= 15)), " +
      "ctmtw AS (SELECT DISTINCT wh FROM ctmw WHERE split = 'test'), " +
      "ctmr AS (SELECT w.doc_id, list(pos ORDER BY pos) AS starts, " +
      "COUNT(*) AS n_dup FROM ctmw w JOIN ctmtw USING (wh) " +
      "WHERE w.split = 'train' GROUP BY w.doc_id)"

  /** q174's reassembly over the train split vs the test window set. */
  private val ctmPurge =
    "ctmj AS (SELECT f.doc_id, f.source, toks, " +
      "COALESCE(starts, CAST([] AS BIGINT[])) AS starts, " +
      "COALESCE(n_dup, 0) AS n_dup FROM ctmf f " +
      "LEFT JOIN ctmr ON f.doc_id = ctmr.doc_id " +
      "WHERE f.split = 'train'), " +
      "ctmk AS (SELECT doc_id, source, toks, n_dup, " +
      "list_filter(range(0, len(toks)), tk -> " +
      "len(list_filter(starts, s -> s <= tk AND tk < s + 15)) = 0) " +
      "AS kept FROM ctmj)"

  private val purgeSummarySql =
    s"WITH $ctmBase, $ctmPurge " +
      "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_train_docs, " +
      "CAST(SUM(CASE WHEN n_dup > 0 THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS n_contaminated, " +
      "CAST(SUM(len(toks)) AS BIGINT) AS tokens_before, " +
      "CAST(SUM(len(kept)) AS BIGINT) AS tokens_after, " +
      "CAST(SUM(len(toks)) - SUM(len(kept)) AS BIGINT) AS tokens_lost " +
      "FROM ctmk GROUP BY source ORDER BY source"

  val sql: Map[String, String] = Map(
    // q412: per source — train docs, contaminated docs, shared-window
    // mass, contaminated share
    "q412_contamination_matrix" ->
      (s"WITH $ctmBase " +
        "SELECT f.source, CAST(COUNT(*) AS BIGINT) AS n_train_docs, " +
        "CAST(SUM(CASE WHEN ctmr.doc_id IS NOT NULL THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_contaminated, " +
        "CAST(COALESCE(SUM(ctmr.n_dup), 0) AS BIGINT) " +
        "AS n_shared_windows, " +
        "CAST(SUM(CASE WHEN ctmr.doc_id IS NOT NULL THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS contam_share " +
        "FROM ctmf f LEFT JOIN ctmr ON f.doc_id = ctmr.doc_id " +
        "WHERE f.split = 'train' GROUP BY f.source ORDER BY f.source"),
    // q413: the purge work list — q174's per-doc reassembly against
    // the test window set, contaminated docs only
    "q413_contamination_purge" ->
      (s"WITH $ctmBase, $ctmPurge " +
        "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, " +
        "CAST(greatest(len(toks) - 14, 0) AS BIGINT) AS n_windows, " +
        "CAST(n_dup AS BIGINT) AS n_dup_windows, " +
        "CAST(len(kept) AS BIGINT) AS n_kept_tokens, " +
        "CAST(len(kept) AS DOUBLE) / CAST(len(toks) AS DOUBLE) " +
        "AS keep_ratio, " +
        "md5(COALESCE(array_to_string(" +
        "list_transform(kept, tk -> toks[CAST(tk + 1 AS INT)]), ' '), " +
        "'')) AS kept_md5 " +
        "FROM ctmk WHERE n_dup > 0 ORDER BY doc_id"),
    // q414: what decontamination costs, per source
    "q414_contamination_summary" -> purgeSummarySql,
    // q415: the cells sum-merge against the fixed test set — q414's
    // SQL verbatim
    "q415_streaming_contamination" -> purgeSummarySql)
}
