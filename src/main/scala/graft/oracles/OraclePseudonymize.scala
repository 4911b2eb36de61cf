package graft.oracles

/** DuckDB oracles for pseudonymization (q468–q470) and the
  * CDF-driven MV maintenance (q471). Tokens are md5 over the same
  * salted string in both engines. CTE prefix `pk`.
  */
object OraclePseudonymize {

  private val Base =
    "WITH pke AS (SELECT user_id, event_type, " +
      "md5('pk|' || CAST(user_id AS VARCHAR)) AS token FROM events) "

  val sql: Map[String, String] = Map(
    // q468: injectivity census per event type
    "q468_pseudonymize_census" ->
      (Base +
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events, " +
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users, " +
        "CAST(COUNT(DISTINCT token) AS BIGINT) AS n_tokens " +
        "FROM pke GROUP BY event_type ORDER BY event_type"),
    // q469: events-per-key histogram, token space vs raw, side by side
    "q469_token_histogram_parity" ->
      (Base +
        ", pkt AS (SELECT n_events, CAST(COUNT(*) AS BIGINT) AS " +
        "n_keys_tokenized FROM (SELECT token, CAST(COUNT(*) AS " +
        "BIGINT) AS n_events FROM pke GROUP BY token) GROUP BY 1), " +
        "pkr AS (SELECT n_events, CAST(COUNT(*) AS BIGINT) AS " +
        "n_keys_raw FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) " +
        "AS n_events FROM pke GROUP BY user_id) GROUP BY 1) " +
        "SELECT COALESCE(t.n_events, r.n_events) AS n_events, " +
        "COALESCE(t.n_keys_tokenized, 0) AS n_keys_tokenized, " +
        "COALESCE(r.n_keys_raw, 0) AS n_keys_raw " +
        "FROM pkt t FULL OUTER JOIN pkr r ON t.n_events = r.n_events " +
        "ORDER BY n_events"),
    // q470: escrow round-trip — token totals re-keyed to users equal
    // the raw totals
    "q470_escrow_roundtrip" ->
      (Base +
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS " +
        "n_events_via_token, CAST(COUNT(*) AS BIGINT) AS " +
        "n_events_raw FROM pke GROUP BY user_id ORDER BY user_id"),
    // q471: the (source) view maintained by the q452 feed equals the
    // direct recompute over the final corpus (all batches minus the
    // %37 erasure)
    "q471_mv_incremental_parity" ->
      ("SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM documents " +
        "WHERE doc_id % 37 <> 0 GROUP BY source ORDER BY source"))
}
