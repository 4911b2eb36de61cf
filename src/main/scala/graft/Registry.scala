package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Central query registry: every implemented operator from SURVEY.md §2
  * gets a named query over the driver testdata plus (where ANSI-SQL-
  * expressible) a DuckDB oracle. Column names and row order match the
  * oracle exactly (aliased on both sides; every oracle-compared query ends
  * in a total-order sort).
  */
object Registry {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q01_watermark_last_id" -> ((s, d) => Incremental.watermarkLastId(s, d)),
    "q02_batch_counter" -> ((s, d) => Incremental.batchCounter(s, d)),
    "q03_incremental_batch" -> ((s, d) => Incremental.incrementalBatch(s, d)),
    "q04_insert_update_split" -> ((s, d) => Incremental.insertUpdateSplit(s, d)),
    "q05_semi_join" -> ((s, d) => Relational.semiJoin(s, d)),
    "q06_anti_join" -> ((s, d) => Relational.antiJoin(s, d)),
    "q07_enrich_broadcast" -> ((s, d) => Relational.enrichBroadcast(s, d)),
    "q08_delete_complement" -> ((s, d) => Incremental.deleteComplement(s, d)),
    "q09_topk" -> ((s, d) => Relational.topK(s, d)),
    "q10_key_registry" -> ((s, d) => Incremental.keyRegistryUnion(s, d)),
    "q11_first_per_key" -> ((s, d) => Incremental.firstPerKey(s, d)),
    "q12_window_analytics" -> ((s, d) => Relational.windowAnalytics(s, d)),
    "q13_rollup_orders" -> ((s, d) => Relational.rollupOrders(s, d)),
    "q14_ordered_fold_distinct" -> ((s, d) => Relational.orderedFoldDistinct(s, d)),
    "q15_set_ops" -> ((s, d) => Relational.setOps(s, d)),
  )

  val oracleSql: Map[String, String] = Map(
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
    "q05_semi_join" ->
      ("SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey"),
    "q06_anti_join" ->
      ("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_totalprice > 450000.0) ORDER BY c_custkey"),
    "q07_enrich_broadcast" ->
      ("SELECT o_orderkey, c_name, n_name, r_name FROM orders " +
        "LEFT JOIN customer ON o_custkey = c_custkey " +
        "LEFT JOIN nation ON c_nationkey = n_nationkey " +
        "LEFT JOIN region ON n_regionkey = r_regionkey ORDER BY o_orderkey"),
    "q08_delete_complement" ->
      ("SELECT COUNT(*) AS kept, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS kept_qty " +
        "FROM lineitem WHERE NOT (l_returnflag = 'A' " +
        "AND l_shipdate >= TIMESTAMP '1995-01-01')"),
    "q09_topk" ->
      ("SELECT event_id, user_id, value FROM events " +
        "ORDER BY value DESC, event_id LIMIT 10"),
    "q10_key_registry" ->
      ("SELECT user_id AS key FROM events UNION " +
        "SELECT c_custkey AS key FROM customer ORDER BY key"),
    "q11_first_per_key" ->
      ("SELECT user_id, event_id AS first_event_id, event_type AS first_type, " +
        "CAST(CAST(ts AS DATE) AS VARCHAR) AS first_day FROM " +
        "(SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn " +
        "FROM events) WHERE rn = 1 ORDER BY user_id"),
    "q12_window_analytics" ->
      ("SELECT user_id, event_id, event_type, " +
        "LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id " +
        "ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) " +
        "AS running_value FROM events ORDER BY user_id, event_id"),
    "q13_rollup_orders" ->
      ("SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price, " +
        "CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status, " +
        "CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority " +
        "FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority) " +
        "ORDER BY g_status, g_priority, o_orderstatus ASC NULLS FIRST, " +
        "o_orderpriority ASC NULLS FIRST"),
    "q14_ordered_fold_distinct" ->
      ("SELECT user_id, STRING_AGG(event_type, ',' ORDER BY event_id) AS type_seq, " +
        "COUNT(*) AS n_distinct_types FROM " +
        "(SELECT user_id, event_id, event_type, ROW_NUMBER() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY event_id) AS rn FROM events) " +
        "WHERE rn = 1 GROUP BY user_id ORDER BY user_id"),
    "q15_set_ops" ->
      ("SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150.0 " +
        "EXCEPT SELECT user_id FROM events WHERE event_type = 'error' " +
        "AND value > 150.0 ORDER BY user_id"),
  )
}
