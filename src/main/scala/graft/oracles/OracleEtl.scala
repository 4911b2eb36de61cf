package graft.oracles

/** DuckDB oracle SQL — incremental ETL, upsert/mutation, SQL-surface, pipeline, JDBC and format queries.
  *
  * Split out of `graft.Registry` (which had grown past 1,900 lines);
  * `Registry.oracleSql` merges the per-family maps and asserts key
  * disjointness. Entry text is unchanged — column aliases and total-
  * order sorts still mirror the Spark queries exactly.
  */
private[graft] object OracleEtl {
  val sql: Map[String, String] = Map(
    "q01_watermark_last_id" ->
      "SELECT MAX(event_id) AS last_id FROM events WHERE event_type = 'purchase'",
    "q02_batch_counter" ->
      ("SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, " +
        "CAST(COALESCE(MAX(CAST(FLOOR(value) AS BIGINT)), 0) + 1 AS BIGINT) AS next_batch " +
        "FROM events GROUP BY 1 ORDER BY day"),
    "q03_incremental_batch" ->
      ("SELECT event_id, user_id, event_type FROM events " +
        "WHERE event_id > (SELECT COALESCE(MAX(event_id), -1) FROM events " +
        "WHERE event_type = 'signup') ORDER BY event_id"),
    "q04_insert_update_split" ->
      ("SELECT CAST(COALESCE(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS inserts, " +
        "CAST(COALESCE(SUM(CASE WHEN c_custkey IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS updates, " +
        "COUNT(*) AS total FROM events LEFT JOIN customer ON user_id = c_custkey"),
    "q08_delete_complement" ->
      ("SELECT COUNT(*) AS kept, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS kept_qty " +
        "FROM lineitem WHERE NOT (l_returnflag = 'A' " +
        "AND l_shipdate >= TIMESTAMP '1995-01-01')"),
    "q10_key_registry" ->
      ("SELECT user_id AS key FROM events UNION " +
        "SELECT c_custkey AS key FROM customer ORDER BY key"),
    "q11_first_per_key" ->
      ("SELECT user_id, event_id AS first_event_id, event_type AS first_type, " +
        "CAST(CAST(ts AS DATE) AS VARCHAR) AS first_day FROM " +
        "(SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn " +
        "FROM events) WHERE rn = 1 ORDER BY user_id"),
    "q40_upsert" ->
      ("SELECT c_custkey AS key, 'existing' AS origin FROM customer " +
        "UNION ALL SELECT user_id AS key, 'inserted' AS origin FROM " +
        "(SELECT DISTINCT user_id FROM events WHERE user_id NOT IN " +
        "(SELECT c_custkey FROM customer)) ORDER BY key, origin"),
    "q41_update_write" ->
      ("WITH u AS (SELECT user_id, SUM(CAST(value AS DECIMAL(18,2))) AS spend " +
        "FROM events WHERE event_type = 'purchase' GROUP BY user_id) " +
        "SELECT c_custkey, c_acctbal AS old_acctbal, " +
        "COALESCE(CAST(CAST(c_acctbal AS DECIMAL(18,2)) - spend AS DOUBLE), c_acctbal) AS new_acctbal, " +
        "CAST(CASE WHEN spend IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS updated " +
        "FROM customer LEFT JOIN u ON c_custkey = user_id ORDER BY c_custkey"),
    "q42_replay" ->
      ("SELECT event_id, user_id, CASE WHEN event_id <= " +
        "(SELECT COALESCE(MAX(event_id), -1) FROM events WHERE event_type = 'signup') " +
        "THEN 'stored' ELSE 'replayed' END AS state FROM events ORDER BY event_id"),
    "q43_batch_log" ->
      ("SELECT CAST(1 AS BIGINT) AS batch_no, 'success' AS status, " +
        "COUNT(*) AS record_count, MIN(event_id) AS first_id, MAX(event_id) AS last_id, " +
        "CAST(CAST(MIN(ts) AS DATE) AS VARCHAR) AS started_day, " +
        "CAST(CAST(MAX(ts) AS DATE) AS VARCHAR) AS finished_day FROM events"),
    "q44_state_rebuild" ->
      ("SELECT user_id, COUNT(*) AS n_events, MAX(event_id) AS last_event_id, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    "q48_json_extract" ->
      ("WITH j AS (SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k " +
        "FROM events) SELECT k % 10 AS k_bucket, COUNT(*) AS n, " +
        "CAST(SUM(k) AS BIGINT) AS sum_k FROM j GROUP BY k % 10 ORDER BY k_bucket"),
    "q49_keyset_page" ->
      ("SELECT event_id, user_id, event_type FROM events WHERE event_id > 500 " +
        "ORDER BY event_id LIMIT 100"),
    "q50_custom_source" ->
      ("SELECT 'u' || CAST(r % 100 AS VARCHAR) AS category, COUNT(*) AS n, " +
        "CAST(SUM(r * 31 % 1000) AS BIGINT) AS sum_k, MIN(r) AS min_id, MAX(r) AS max_id " +
        "FROM range(98001, 100000) t(r) GROUP BY 1 ORDER BY category"),
    "q51_slot_fold_agg" ->
      ("WITH x AS (SELECT user_id, event_id, 1 AS i, event_type AS tok FROM events " +
        "UNION ALL SELECT user_id, event_id, 2 AS i, " +
        "CAST(CAST(FLOOR(value) AS BIGINT) AS VARCHAR) AS tok FROM events), " +
        "d AS (SELECT user_id, event_id, i, tok, ROW_NUMBER() OVER " +
        "(PARTITION BY user_id, tok ORDER BY event_id, i) AS rn FROM x), " +
        "o AS (SELECT user_id, tok, ROW_NUMBER() OVER " +
        "(PARTITION BY user_id ORDER BY event_id, i) AS seq FROM d WHERE rn = 1) " +
        "SELECT user_id, " +
        "COALESCE(string_agg(tok, '|' ORDER BY seq) FILTER (WHERE seq <= 10), '') AS slots, " +
        "COALESCE(string_agg(tok, ',' ORDER BY seq) FILTER (WHERE seq > 10), '') AS overflow " +
        "FROM o GROUP BY user_id ORDER BY user_id"),
    "q52_grouping_sets" ->
      ("WITH e AS (SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day FROM events) " +
        "SELECT event_type, day, COUNT(*) AS n, " +
        "CAST(GROUPING(event_type) AS BIGINT) AS g_type, " +
        "CAST(GROUPING(day) AS BIGINT) AS g_day " +
        "FROM e GROUP BY GROUPING SETS ((event_type), (day), ()) " +
        "ORDER BY g_type, g_day, event_type ASC NULLS FIRST, day ASC NULLS FIRST"),
    "q53_range_frame" ->
      ("SELECT user_id, event_id, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_value, " +
        "COUNT(*) OVER w AS trailing_n FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY event_id " +
        "RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) " +
        "ORDER BY user_id, event_id"),
    "q54_mixed_case_normalize" ->
      ("SELECT event_id, user_id, event_type, " +
        "CASE WHEN value > 100 THEN value ELSE 0.0 END AS total_price " +
        "FROM events ORDER BY event_id"),
    "q65_jdbc_roundtrip" ->
      ("SELECT event_type, COUNT(*) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value, " +
        "MIN(event_id) AS min_event_id, MAX(event_id) AS max_event_id " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q71_scd2_history" ->
      ("WITH c AS (SELECT user_id, event_id, event_type, " +
        "CASE WHEN LAG(event_type) OVER w IS NULL " +
        "OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)), " +
        "r AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg FROM c), " +
        "g AS (SELECT user_id, CAST(seg AS BIGINT) AS seg, " +
        "MIN(event_type) AS event_type, MIN(event_id) AS valid_from_id, " +
        "COUNT(*) AS n_events FROM r GROUP BY user_id, seg) " +
        "SELECT user_id, seg, event_type, valid_from_id, " +
        "LEAD(valid_from_id) OVER (PARTITION BY user_id ORDER BY seg) AS valid_to_id, " +
        "n_events FROM g ORDER BY user_id, seg"),
    "q87_quarantine_routing" ->
      ("WITH r AS (SELECT event_type, CASE WHEN event_id % 7 = 3 " +
        "THEN substring(props, 1, len(props) - 2) ELSE props END AS raw FROM events) " +
        "SELECT event_type, COUNT(*) AS n_events, " +
        "COUNT(CASE WHEN json_valid(raw) THEN 1 END) AS n_valid, " +
        "COUNT(*) - COUNT(CASE WHEN json_valid(raw) THEN 1 END) AS n_quarantined, " +
        "CAST(SUM(CASE WHEN json_valid(raw) " +
        "THEN CAST(json_extract_string(raw, '$.k') AS BIGINT) END) AS BIGINT) AS k_sum " +
        "FROM r GROUP BY event_type ORDER BY event_type"),
    "q93_response_projection" ->
      ("WITH b AS (SELECT CAST(FLOOR(event_id / 1000) AS BIGINT) AS batch_no, " +
        "COUNT(*) AS cnt, MAX(event_id) AS last_id, " +
        "CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ic, " +
        "CAST(SUM(CASE WHEN c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS uc " +
        "FROM events LEFT JOIN customer ON user_id = c_custkey GROUP BY 1) " +
        "SELECT batch_no, '{\"message\":\"Batch completed\",\"batch_no\":' || batch_no || " +
        "',\"count\":' || cnt || ',\"lastId\":' || last_id || " +
        "',\"insertCount\":' || ic || ',\"updateCount\":' || uc || '}' AS response " +
        "FROM b ORDER BY batch_no"),
    // the Spark side aggregates AFTER an ORC and a CSV round-trip; the
    // oracle aggregates the parquet originals — a hash match proves the
    // codecs round-tripped every value
    "q103_format_roundtrip" ->
      ("SELECT 'orc_by_source' AS dim, source AS key, " +
        "CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS sum_chars " +
        "FROM documents GROUP BY source " +
        "UNION ALL " +
        "SELECT 'csv_by_lang', lang, CAST(COUNT(*) AS BIGINT), " +
        "CAST(SUM(n_chars) AS BIGINT) " +
        "FROM documents GROUP BY lang " +
        "UNION ALL " +
        "SELECT 'json_total', 'all', CAST(COUNT(*) AS BIGINT), " +
        "CAST(SUM(length(text)) AS BIGINT) " +
        "FROM documents " +
        "ORDER BY dim, key"),
  )
}
