package graft.oracles

/** DuckDB oracles for the repetition screens (q423–q425). Integer
  * numerators, one division per metric; flags are plain comparisons.
  * CTE prefix `rep`.
  */
object OracleRepetition {

  private val repBase =
    "rept AS (SELECT doc_id, source, " +
      "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
      "AS toks FROM documents), " +
      "repf AS (SELECT * FROM rept WHERE len(toks) > 0), " +
      "repb AS (SELECT doc_id, toks[i+1] || ' ' || toks[i+2] AS g " +
      "FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - 1)) " +
      "AS i FROM repf WHERE len(toks) >= 2)), " +
      "repc AS (SELECT doc_id, g, COUNT(*) AS c FROM repb " +
      "GROUP BY doc_id, g), " +
      "repm AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / " +
      "CAST(SUM(c) AS DOUBLE) AS top2_frac FROM repc GROUP BY doc_id), " +
      "repd AS (SELECT f.doc_id, f.source, " +
      "CAST(len(toks) AS BIGINT) AS n_tokens, " +
      "CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) " +
      "/ CAST(len(toks) AS DOUBLE) AS mean_word_len, " +
      "CAST(len(list_distinct(toks)) AS DOUBLE) / " +
      "CAST(len(toks) AS DOUBLE) AS distinct_ratio, " +
      "COALESCE(repm.top2_frac, 0.0) AS top2_frac " +
      "FROM repf f LEFT JOIN repm ON f.doc_id = repm.doc_id), " +
      "repx AS (SELECT *, " +
      "NOT (mean_word_len BETWEEN 3.0 AND 10.0) AS fail_wordlen, " +
      "top2_frac > 0.08 AS fail_top2, " +
      "distinct_ratio < 0.35 AS fail_repetition FROM repd)"

  private val rollupSql =
    s"WITH $repBase " +
      "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
      "CAST(SUM(CASE WHEN fail_wordlen THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS n_fail_wordlen, " +
      "CAST(SUM(CASE WHEN fail_top2 THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS n_fail_top2, " +
      "CAST(SUM(CASE WHEN fail_repetition THEN 1 ELSE 0 END) " +
      "AS BIGINT) AS n_fail_repetition, " +
      "CAST(SUM(CASE WHEN NOT fail_wordlen AND NOT fail_top2 AND " +
      "NOT fail_repetition THEN 1 ELSE 0 END) AS BIGINT) AS n_pass, " +
      "CAST(SUM(CASE WHEN NOT fail_wordlen AND NOT fail_top2 AND " +
      "NOT fail_repetition THEN 1 ELSE 0 END) AS DOUBLE) / " +
      "CAST(COUNT(*) AS DOUBLE) AS pass_rate " +
      "FROM repx GROUP BY source ORDER BY source"

  val sql: Map[String, String] = Map(
    // q423: the work list — docs failing any rule, with metrics
    "q423_repetition_screen" ->
      (s"WITH $repBase " +
        "SELECT doc_id, n_tokens, mean_word_len, top2_frac, " +
        "distinct_ratio, fail_wordlen, fail_top2, fail_repetition " +
        "FROM repx WHERE fail_wordlen OR fail_top2 OR fail_repetition " +
        "ORDER BY doc_id"),
    "q424_repetition_rollup" -> rollupSql,
    // q425: the cells sum-merge — q424's SQL verbatim
    "q425_streaming_repetition" -> rollupSql)
}
