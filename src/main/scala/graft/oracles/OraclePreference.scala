package graft.oracles

/** DuckDB oracles for preference-data QA (q480–q481). CTE prefix
  * `pf`.
  */
object OraclePreference {

  private val Base =
    "WITH pfm AS (SELECT user_id, event_type, " +
      "CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) " +
      "AS cents FROM events GROUP BY 1, 2), " +
      "pfj AS (SELECT a.user_id, a.event_type AS type_a, " +
      "b.event_type AS type_b, CASE WHEN a.cents > b.cents THEN 1 " +
      "ELSE 0 END AS a_wins FROM pfm a JOIN pfm b ON a.user_id = " +
      "b.user_id AND a.event_type < b.event_type AND a.cents <> " +
      "b.cents), " +
      "pfx AS (SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS " +
      "n_compared, CAST(SUM(a_wins) AS BIGINT) AS n_a_wins, " +
      "CAST(COUNT(*) - SUM(a_wins) AS BIGINT) AS n_b_wins FROM pfj " +
      "GROUP BY 1, 2) "

  val sql: Map[String, String] = Map(
    // q480: the pairwise win matrix with majority margins
    "q480_preference_matrix" ->
      (Base +
        "SELECT type_a, type_b, n_compared, n_a_wins, n_b_wins, " +
        "ABS(n_a_wins - n_b_wins) AS margin FROM pfx " +
        "ORDER BY type_a, type_b"),
    // q481: Condorcet 3-cycles of the majority relation, canonical
    // orientation (smallest member first)
    "q481_preference_cycles" ->
      (Base +
        ", pfe AS (SELECT CASE WHEN n_a_wins > n_b_wins THEN type_a " +
        "ELSE type_b END AS w, CASE WHEN n_a_wins > n_b_wins THEN " +
        "type_b ELSE type_a END AS l FROM pfx WHERE n_a_wins <> " +
        "n_b_wins) " +
        "SELECT e1.w AS x, e1.l AS y, e2.l AS z FROM pfe e1 " +
        "JOIN pfe e2 ON e1.l = e2.w " +
        "JOIN pfe e3 ON e2.l = e3.w AND e3.l = e1.w " +
        "WHERE e1.w < e1.l AND e1.w < e2.l ORDER BY 1, 2, 3"))
}
