package graft.oracles

/** DuckDB oracles for the PSI drift family (q419–q421). Counts are
  * exact; shares and per-band terms are one division/ln each; the
  * total folds band terms in band order. CTE prefix `psi`.
  */
object OraclePsi {

  private def splitByte(idExpr: String): String =
    s"(strpos('0123456789abcdef', substr(md5('split|' || " +
      s"CAST($idExpr AS VARCHAR)), 1, 1)) - 1) * 16 + " +
      s"strpos('0123456789abcdef', substr(md5('split|' || " +
      s"CAST($idExpr AS VARCHAR)), 2, 1)) - 1"

  private val psiBase =
    "psit AS (SELECT doc_id, " +
      "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
      "AS toks FROM documents), " +
      "psis AS (SELECT doc_id, " +
      "(len(list_distinct(toks)) * 1000) // len(toks) AS score " +
      "FROM psit WHERE len(toks) > 0), " +
      "psib AS (SELECT CAST(CASE WHEN score < 375 THEN 0 " +
      "WHEN score < 475 THEN 1 WHEN score < 625 THEN 2 ELSE 3 END " +
      "AS BIGINT) AS band, " +
      s"CASE WHEN ${splitByte("doc_id")} < 204 THEN 'train' " +
      s"WHEN ${splitByte("doc_id")} < 230 THEN 'val' ELSE 'test' END " +
      "AS split FROM psis), " +
      "psic AS (SELECT band, " +
      "CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) " +
      "AS BIGINT) AS n_train, " +
      "CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) " +
      "AS BIGINT) AS n_test FROM psib WHERE split <> 'val' " +
      "GROUP BY band), " +
      "psip AS (SELECT band, n_train, n_test, " +
      "CAST(n_train AS DOUBLE) / " +
      "CAST(SUM(n_train) OVER () AS DOUBLE) AS p_train, " +
      "CAST(n_test AS DOUBLE) / " +
      "CAST(SUM(n_test) OVER () AS DOUBLE) AS p_test FROM psic), " +
      "psix AS (SELECT band, n_train, n_test, p_train, p_test, " +
      "(p_train - p_test) * ln(p_train / p_test) AS psi_term " +
      "FROM psip)"

  private val bandsSql =
    s"WITH $psiBase SELECT band, n_train, n_test, p_train, p_test, " +
      "psi_term FROM psix ORDER BY band"

  val sql: Map[String, String] = Map(
    "q419_psi_bands" -> bandsSql,
    // q420: band terms folded in band order (left fold from 0.0)
    "q420_psi_total" ->
      (s"WITH $psiBase, " +
        "psif AS (SELECT list_reduce(list_prepend(0.0, " +
        "list(psi_term ORDER BY band)), (a, b) -> a + b) AS psi " +
        "FROM psix) " +
        "SELECT psi, CASE WHEN psi < 0.1 THEN 'stable' " +
        "WHEN psi < 0.25 THEN 'watch' ELSE 'drifted' END AS verdict " +
        "FROM psif"),
    // q421: the (band, split) cells sum-merge — q419's SQL verbatim
    "q421_streaming_psi" -> bandsSql)
}
