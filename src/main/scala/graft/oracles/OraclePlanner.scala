package graft.oracles

/** DuckDB oracles for the join-stats planner (q409) and the
  * derived-view retraction pair (q410–q411).
  *
  * q409 recomputes each edge's key-grain stats; q410 recomputes TPC-H
  * Q1 over the retained rows (hash equality proves the engine's
  * negative-delta merge is exact); q411 recomputes the basket chain
  * over retained orders (proving the distinct-grain anti-join
  * retraction). Retained = orders NOT of customers with
  * c_custkey % 97 == 0 (the q404 cascade).
  *
  * CTE prefixes `jpl`/`rtr` are unique to these rows.
  */
object OraclePlanner {

  private def jplEdge(name: String, fact: String, key: String,
      dim: String): String =
    "SELECT relation, fact_rows, fact_keys, max_mult, dim_rows, " +
      "skew_x1000, CASE WHEN dim_rows <= 100000 THEN 'broadcast_dim' " +
      "WHEN skew_x1000 > 16000 THEN 'shuffle_salted' " +
      "ELSE 'shuffle_hash' END AS recommend FROM (" +
      s"SELECT '$name' AS relation, " +
      "CAST(SUM(cnt) AS BIGINT) AS fact_rows, " +
      "CAST(COUNT(*) AS BIGINT) AS fact_keys, " +
      "CAST(MAX(cnt) AS BIGINT) AS max_mult, " +
      s"(SELECT CAST(COUNT(*) AS BIGINT) FROM $dim) AS dim_rows, " +
      "CASE WHEN COUNT(*) > 0 THEN " +
      "(CAST(MAX(cnt) AS BIGINT) * 1000) // " +
      "(CAST(SUM(cnt) AS BIGINT) // COUNT(*)) " +
      "ELSE 0 END AS skew_x1000 FROM " +
      s"(SELECT $key AS k, COUNT(*) AS cnt FROM $fact " +
      s"GROUP BY $key) jplk) jple"

  private val rtrRetained =
    "l_orderkey NOT IN (SELECT o_orderkey FROM orders " +
      "WHERE o_custkey % 97 = 0)"

  private val jplUnion = Seq(
    jplEdge("lineitem.l_orderkey->orders", "lineitem",
      "l_orderkey", "orders"),
    jplEdge("lineitem.l_partkey->part", "lineitem", "l_partkey",
      "part"),
    jplEdge("lineitem.l_suppkey->supplier", "lineitem",
      "l_suppkey", "supplier"),
    jplEdge("orders.o_custkey->customer", "orders", "o_custkey",
      "customer"),
    jplEdge("customer.c_nationkey->nation", "customer",
      "c_nationkey", "nation"),
    jplEdge("supplier.s_nationkey->nation", "supplier",
      "s_nationkey", "nation"),
    jplEdge("nation.n_regionkey->region", "nation", "n_regionkey",
      "region"),
    jplEdge("events.user_id->customer", "events", "user_id",
      "customer"))
    .mkString(" UNION ALL ")

  /** One staleness row (q504): the fact's volume at the analyze
    * boundary (keys below 2·step of the orders-key split) vs now.
    */
  private def jplStale(name: String, fact: String,
      key: String): String =
    s"SELECT '$name' AS relation, " +
      s"CAST(SUM(CASE WHEN $key < (SELECT 2 * " +
      "((MAX(o_orderkey) + 3) // 3) FROM orders) THEN 1 ELSE 0 END) " +
      "AS BIGINT) AS fact_rows_stale, " +
      "CAST(COUNT(*) AS BIGINT) AS fact_rows_fresh " +
      s"FROM $fact"

  val sql: Map[String, String] = Map(
    "q409_join_stats_planner" ->
      s"SELECT * FROM ($jplUnion) AS jplu ORDER BY relation",
    // q504: the ANALYZE cadence — per key-domain edge, stale (prefix)
    // vs fresh fact volume and the re-analyze verdict
    "q504_stats_staleness" ->
      ("SELECT relation, fact_rows_stale, fact_rows_fresh, " +
        "CASE WHEN fact_rows_stale > 0 THEN " +
        "((fact_rows_fresh - fact_rows_stale) * 1000) // " +
        "fact_rows_stale ELSE 1000 END AS growth_x1000, " +
        "(CASE WHEN fact_rows_stale > 0 THEN " +
        "((fact_rows_fresh - fact_rows_stale) * 1000) // " +
        "fact_rows_stale ELSE 1000 END) > 200 AS reanalyze FROM (" +
        jplStale("lineitem.l_orderkey->orders", "lineitem",
          "l_orderkey") +
        " UNION ALL " +
        jplStale("lineitem.l_partkey->part", "lineitem", "l_orderkey") +
        " UNION ALL " +
        jplStale("lineitem.l_suppkey->supplier", "lineitem",
          "l_orderkey") +
        " UNION ALL " +
        jplStale("orders.o_custkey->customer", "orders", "o_orderkey") +
        ") ORDER BY relation"),
    // q437: the engine must plan exactly what the planner recommends
    // when driven as recommended — the oracle recomputes the
    // recommendation and maps it to the REQUIRED physical operator;
    // the engine-side `actual` comes from the real physical plan, so
    // an ignored hint or an out-planned broadcast breaks the hash
    "q437_plan_conformance" ->
      ("SELECT relation, recommend, " +
        "CASE recommend WHEN 'broadcast_dim' THEN 'broadcast_hash' " +
        "WHEN 'shuffle_salted' THEN 'shuffle_hash_salted' " +
        "ELSE 'shuffle_hash' END AS actual, TRUE AS agree " +
        s"FROM ($jplUnion) AS jplc ORDER BY relation"),
    // q410: Q1 over retained rows — what the negative-delta merge
    // must reproduce bit-for-bit
    "q410_retractable_pricing" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) " +
        "AS sum_qty, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) " +
        "AS sum_base_price, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "(CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) " +
        "AS DOUBLE) AS sum_disc_price, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "(CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2))) * " +
        "(CAST(1 AS DECIMAL(5,2)) + CAST(l_tax AS DECIMAL(5,2)))) " +
        "AS DOUBLE) AS sum_charge, " +
        "COUNT(*) AS count_order FROM lineitem " +
        "WHERE l_shipdate <= TIMESTAMP '2001-09-02' " +
        s"AND $rtrRetained " +
        "GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus"),
    // q411: the q381 chain over retained orders — what the
    // distinct-grain anti-join retraction must reproduce
    "q411_retractable_affinity" ->
      ("WITH rtrob AS (SELECT DISTINCT l_orderkey, p_brand " +
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey " +
        s"WHERE $rtrRetained), " +
        "rtrn AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders " +
        "FROM rtrob), " +
        "rtrpb AS (SELECT p_brand, COUNT(*) AS n_brand FROM rtrob " +
        "GROUP BY p_brand), " +
        "rtrl AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, " +
        "COUNT(*) AS n_cooc, ANY_VALUE(na.n_brand) AS n_a, " +
        "ANY_VALUE(nb.n_brand) AS n_b, " +
        "ANY_VALUE(rtrn.n_orders) AS n_orders " +
        "FROM rtrob a JOIN rtrob b ON a.l_orderkey = b.l_orderkey " +
        "AND a.p_brand < b.p_brand " +
        "JOIN rtrpb na ON na.p_brand = a.p_brand " +
        "JOIN rtrpb nb ON nb.p_brand = b.p_brand CROSS JOIN rtrn " +
        "GROUP BY a.p_brand, b.p_brand) " +
        "SELECT brand_a, brand_b, CAST(n_cooc AS BIGINT) AS n_cooc, " +
        "CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, " +
        "CAST(n_cooc * n_orders AS DOUBLE) / " +
        "CAST(n_a * n_b AS DOUBLE) AS lift " +
        "FROM rtrl ORDER BY brand_a, brand_b"))
}
