package graft.oracles

/** DuckDB oracles for the user-scope erasure / retention family
  * (q404–q408).
  *
  * The request is key % 97 == 0 on the shared id domain (c_custkey /
  * user_id — the q07 enrichment convention); the executor facts are
  * the raw tables minus the request (the ledger rewrite is content-
  * exact); the retention cutoff is a fixed timestamp literal inside
  * the events fixture's own epoch (January 2024). Money follows the
  * house convention: DECIMAL(18,2)-exact sums, DOUBLE at
  * presentation.
  *
  * CTE prefix `use` is unique to this family.
  */
object OracleUserErasure {

  private val Mod = 97

  val sql: Map[String, String] = Map(
    // q404: the FK cascade blast radius, per surface
    "q404_user_cascade_plan" ->
      ("SELECT * FROM (" +
        "SELECT 'customer' AS surface, " +
        "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_keys " +
        s"FROM customer WHERE c_custkey % $Mod = 0 " +
        "UNION ALL SELECT 'orders', CAST(COUNT(*) AS BIGINT), " +
        "CAST(COUNT(DISTINCT o_custkey) AS BIGINT) " +
        s"FROM orders WHERE o_custkey % $Mod = 0 " +
        "UNION ALL SELECT 'lineitem', CAST(COUNT(*) AS BIGINT), " +
        "CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM lineitem " +
        "WHERE l_orderkey IN (SELECT o_orderkey FROM orders " +
        s"WHERE o_custkey % $Mod = 0) " +
        "UNION ALL SELECT 'events', CAST(COUNT(*) AS BIGINT), " +
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) " +
        s"FROM events WHERE user_id % $Mod = 0 " +
        "UNION ALL SELECT 'contacts_exposed', " +
        "CAST(COUNT(*) AS BIGINT), " +
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) " +
        s"FROM events WHERE user_id % $Mod = 0 AND event_id % 13 = 0" +
        ") ORDER BY surface"),
    // q405: post-erasure events state == raw minus the user set
    "q405_user_erasure_execute" ->
      ("SELECT event_type, COUNT(*) AS n_events, " +
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users " +
        s"FROM events WHERE user_id % $Mod <> 0 " +
        "GROUP BY event_type ORDER BY event_type"),
    // q406: the certificate — state == retained, erased mass surfaced
    "q406_user_erasure_certificate" ->
      ("SELECT event_type, " +
        s"CAST(SUM(CASE WHEN user_id % $Mod <> 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_state, " +
        s"CAST(SUM(CASE WHEN user_id % $Mod <> 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_retained, " +
        s"CAST(SUM(CASE WHEN user_id % $Mod = 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_erased, " +
        "TRUE AS conserved FROM events " +
        "GROUP BY event_type ORDER BY event_type"),
    // q407: time-based retention — retained vs purged per event type
    "q407_retention_rewrite" ->
      ("SELECT event_type, " +
        "CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_retained, " +
        "CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_purged " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    // q408: the cascade's value mass per erased customer
    "q408_cascade_value_mass" ->
      (s"WITH usec AS (SELECT c_custkey FROM customer " +
        s"WHERE c_custkey % $Mod = 0), " +
        "useo AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) " +
        "AS n_orders, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) " +
        "AS order_value FROM orders " +
        "JOIN usec ON o_custkey = c_custkey GROUP BY o_custkey), " +
        "usel AS (SELECT o.o_custkey, CAST(COUNT(*) AS BIGINT) " +
        "AS n_lines FROM lineitem l " +
        "JOIN orders o ON o.o_orderkey = l.l_orderkey " +
        "JOIN usec ON o.o_custkey = c_custkey GROUP BY o.o_custkey), " +
        "usee AS (SELECT user_id AS o_custkey, " +
        "CAST(COUNT(*) AS BIGINT) AS n_events FROM events " +
        s"WHERE user_id % $Mod = 0 GROUP BY user_id) " +
        "SELECT usec.c_custkey AS custkey, " +
        "COALESCE(useo.n_orders, 0) AS n_orders, " +
        "COALESCE(useo.order_value, 0.0) AS order_value, " +
        "COALESCE(usel.n_lines, 0) AS n_lines, " +
        "COALESCE(usee.n_events, 0) AS n_events " +
        "FROM usec " +
        "LEFT JOIN useo ON useo.o_custkey = usec.c_custkey " +
        "LEFT JOIN usel ON usel.o_custkey = usec.c_custkey " +
        "LEFT JOIN usee ON usee.o_custkey = usec.c_custkey " +
        "ORDER BY custkey"))
}
