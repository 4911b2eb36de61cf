package graft.oracles

/** DuckDB oracle SQL — relational, window/analytics, as-of/range, sessionization and join-strategy queries.
  *
  * Split out of `graft.Registry` (which had grown past 1,900 lines);
  * `Registry.oracleSql` merges the per-family maps and asserts key
  * disjointness. Entry text is unchanged — column aliases and total-
  * order sorts still mirror the Spark queries exactly.
  */
private[graft] object OracleRelational {
  val sql: Map[String, String] = Map(
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
    "q09_topk" ->
      ("SELECT event_id, user_id, value FROM events " +
        "ORDER BY value DESC, event_id LIMIT 10"),
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
    "q16_pricing_summary" -> q16Sql,
    // q320: TPC-H Q1 per micro-batch (decimal cell sums merge) —
    // shares q16's oracle verbatim
    "q320_streaming_pricing_summary" -> q16Sql,
    "q17_shipping_priority" ->
      ("SELECT l_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate, o_orderpriority, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') " +
        "AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15' " +
        "GROUP BY l_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderpriority " +
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"),
    "q18_regional_revenue" ->
      ("SELECT r_name, n_name, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue, " +
        "COUNT(*) AS n_items FROM lineitem " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name, n_name ORDER BY r_name, n_name"),
    "q19_salted_agg" ->
      ("SELECT event_type, COUNT(*) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q20_sessionize" ->
      ("WITH g AS (SELECT user_id, ts, event_id, value, " +
        "CASE WHEN LAG(ts) OVER w IS NULL OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS new_session FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM g) " +
        "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events, " +
        "MIN(event_id) AS first_event_id, MAX(event_id) AS last_event_id, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value " +
        "FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id"),
    // q201: SCD2 type-2 history — change rows (lag-compare) versioned
    // by row_number, closed by lead; fixed strftime keeps timestamps
    // hash-exact; NULL valid_to marks the open/current version
    // q203 (the streaming fold) shares the SQL verbatim: time-ordered
    // batch arrival + open-version seeding reproduce the batch chain
    "q201_scd2_history" -> q201Sql,
    "q203_streaming_scd2" -> q201Sql,
    // q202: point-in-time resolve against the q201 history — user-key
    // equality join with [valid_from, valid_to) containment residual
    "q202_scd2_resolve" ->
      ("WITH c AS (SELECT user_id, ts, event_id, event_type, " +
        "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) " +
        "AS prev FROM events), " +
        "ch AS (SELECT * FROM c WHERE prev IS NULL OR prev <> event_type), " +
        "v AS (SELECT user_id, event_type AS attr, " +
        "CAST(ROW_NUMBER() OVER w AS BIGINT) AS version, " +
        "strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from, " +
        "strftime(LEAD(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to " +
        "FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "p AS (SELECT event_id, user_id, " +
        "strftime(ts, '%Y-%m-%d %H:%M:%S') AS at FROM events " +
        "WHERE event_id % 100 = 0) " +
        "SELECT p.event_id, p.user_id, p.at, v.version, v.attr " +
        "FROM p JOIN v USING (user_id) " +
        "WHERE p.at >= v.valid_from AND " +
        "(v.valid_to IS NULL OR p.at < v.valid_to) " +
        "ORDER BY p.event_id"),
    // q198: first-order Markov transition matrix over q20's sessions —
    // consecutive event-type pairs within a session, row-normalized
    "q198_event_transitions" -> q198Sql,
    // q269: q198 per micro-batch (per-user last-event anchors + gated
    // count ledger) — shares q198's oracle verbatim
    "q269_streaming_transitions" -> q198Sql,
    "q21_asof_join" ->
      ("WITH o AS (SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey " +
        "FROM orders GROUP BY o_custkey, o_orderdate) " +
        "SELECT event_id, user_id, o_orderkey FROM events " +
        "ASOF LEFT JOIN o ON user_id = o_custkey AND ts >= o_orderdate " +
        "ORDER BY event_id"),
    "q45_cube" ->
      ("WITH e AS (SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day FROM events) " +
        "SELECT event_type, day, COUNT(*) AS n, " +
        "CAST(GROUPING(event_type) AS BIGINT) AS g_type, " +
        "CAST(GROUPING(day) AS BIGINT) AS g_day " +
        "FROM e GROUP BY CUBE (event_type, day) " +
        "ORDER BY g_type, g_day, event_type NULLS FIRST, day NULLS FIRST"),
    "q46_distinct_exact" ->
      ("SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    // q47: the HLL audit twin — DuckDB computes the exact distinct and
    // expects the Spark-side in-tolerance verdict to be 1, hash-pinning
    // the sketch within its error envelope cross-engine
    "q47_approx_distinct" ->
      ("SELECT event_type, COUNT(*) AS n_events, " +
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact, " +
        "CAST(1 AS BIGINT) AS approx_ok " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    // q81: same pattern for the quantile sketch — exact p50/p90 plus
    // the p45–p55 / p85–p95 envelope verdict the summary guarantees
    "q81_approx_percentiles" ->
      ("SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, " +
        "quantile_cont(value, 0.5) AS p50_exact, " +
        "quantile_cont(value, 0.9) AS p90_exact, " +
        "CAST(1 AS BIGINT) AS approx_ok " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q55_pivot" ->
      ("SELECT user_id, " +
        "COUNT(*) FILTER (WHERE event_type = 'click') AS click, " +
        "COUNT(*) FILTER (WHERE event_type = 'error') AS \"error\", " +
        "COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase, " +
        "COUNT(*) FILTER (WHERE event_type = 'signup') AS signup, " +
        "COUNT(*) FILTER (WHERE event_type = 'view') AS \"view\" " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    "q56_explode_tokens" ->
      ("SELECT tok, COUNT(*) AS n FROM (SELECT unnest(list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '')) AS tok FROM documents) " +
        "GROUP BY tok ORDER BY n DESC, tok LIMIT 20"),
    "q57_percentiles" ->
      ("SELECT event_type, quantile_cont(value, 0.5) AS p50, " +
        "quantile_cont(value, 0.9) AS p90, MIN(value) AS vmin, MAX(value) AS vmax " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q58_exact_stats" ->
      ("WITH s AS (SELECT event_type, COUNT(*) AS n, " +
        "SUM(CAST(value AS DECIMAL(9,2))) AS s1, " +
        "SUM(CAST(value AS DECIMAL(9,2)) * CAST(value AS DECIMAL(9,2))) AS s2 " +
        "FROM events GROUP BY event_type) " +
        "SELECT event_type, n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean, " +
        "(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) " +
        "/ CAST(n AS DOUBLE) AS variance FROM s ORDER BY event_type"),
    "q59_salted_join" ->
      ("SELECT c_mktsegment, COUNT(*) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM events LEFT JOIN customer ON user_id = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST"),
    "q60_topk_per_group" ->
      ("SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, n_chars FROM " +
        "(SELECT lang, doc_id, n_chars, ROW_NUMBER() OVER " +
        "(PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rk FROM documents) " +
        "WHERE rk <= 3 ORDER BY lang, rk"),
    "q61_ranking_functions" ->
      ("SELECT event_type, event_id, value, " +
        "CAST(NTILE(4) OVER w AS BIGINT) AS quartile, " +
        "PERCENT_RANK() OVER w AS pct_rank, " +
        "CUME_DIST() OVER w AS cume, " +
        "FIRST_VALUE(event_id) OVER w AS first_id " +
        "FROM events WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC) " +
        "ORDER BY event_type, event_id"),
    "q72_range_join" ->
      ("WITH p AS (SELECT user_id, event_id AS p_id, ts AS p_ts FROM events " +
        "WHERE event_type = 'purchase'), " +
        "e AS (SELECT user_id, event_id AS e_id, ts AS e_ts FROM events " +
        "WHERE event_type = 'error') " +
        "SELECT user_id, COUNT(DISTINCT p_id) AS n_purchases_with_errors, " +
        "COUNT(DISTINCT e_id) AS n_errors_after_purchase, " +
        "MIN(p_id) AS first_purchase_id " +
        "FROM p JOIN e USING (user_id) " +
        "WHERE e_ts >= p_ts AND e_ts < p_ts + INTERVAL 1 HOUR " +
        "GROUP BY user_id ORDER BY user_id"),
    "q78_unpivot" ->
      ("WITH w AS (SELECT user_id, COUNT(*) AS n_events, " +
        "COUNT(DISTINCT event_type) AS n_types, MAX(event_id) AS max_id " +
        "FROM events GROUP BY user_id) " +
        "SELECT user_id, metric, value FROM (" +
        "SELECT user_id, 'max_id' AS metric, max_id AS value FROM w " +
        "UNION ALL SELECT user_id, 'n_events', n_events FROM w " +
        "UNION ALL SELECT user_id, 'n_types', n_types FROM w) " +
        "ORDER BY user_id, metric"),
    "q85_bucketed_join" ->
      ("SELECT o_orderkey, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue, " +
        "COUNT(*) AS n_items FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderkey ORDER BY o_orderkey"),
    // the bloom prune is result-transparent (no false negatives + exact
    // semi-join after), so the oracle is the plain semi-join
    "q98_bloom_pruned_join" ->
      ("SELECT l_returnflag, COUNT(*) AS n_items, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue " +
        "FROM lineitem WHERE l_orderkey IN " +
        "(SELECT o_orderkey FROM orders WHERE o_totalprice > 400000) " +
        "GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q106_gapfill" ->
      ("WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS eday, value " +
        "FROM events), " +
        "d AS (SELECT event_type, eday, COUNT(*) AS n, " +
        "SUM(CAST(value AS DECIMAL(18,6))) AS sv " +
        "FROM ev WHERE value >= 180 GROUP BY event_type, eday), " +
        "cal AS (SELECT unnest(generate_series(" +
        "(SELECT MIN(eday) FROM ev), (SELECT MAX(eday) FROM ev), " +
        "INTERVAL 1 DAY)) AS cday), " +
        "t AS (SELECT DISTINCT event_type FROM ev), " +
        "g AS (SELECT t.event_type, CAST(cal.cday AS DATE) AS gday, " +
        "COALESCE(d.n, 0) AS n, d.sv " +
        "FROM t CROSS JOIN cal LEFT JOIN d " +
        "ON d.event_type = t.event_type AND d.eday = CAST(cal.cday AS DATE)) " +
        "SELECT event_type, CAST(gday AS VARCHAR) AS day, " +
        "CAST(n AS BIGINT) AS n, " +
        "COALESCE(CAST(last_value(sv IGNORE NULLS) OVER " +
        "(PARTITION BY event_type ORDER BY gday " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 0) " +
        "AS carried " +
        "FROM g ORDER BY event_type, day"),
    // two unrolled integer fixed-point PageRank rounds; // is floor
    // division, identical to Spark's div on these positive values
    "q133_pagerank" ->
      ("WITH cs AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey), " +
        "ed AS (SELECT 'c' AS st, c AS sid, 's' AS dt, s AS did FROM cs " +
        "UNION ALL SELECT 's', s, 'c', c FROM cs), " +
        "nodes AS (SELECT DISTINCT st AS t, sid AS id FROM ed), " +
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes), " +
        "deg AS (SELECT st AS t, sid AS id, " +
        "CAST(COUNT(*) AS BIGINT) AS deg FROM ed GROUP BY 1, 2), " +
        "r0 AS (SELECT t, id, (SELECT 1000000000000 // n FROM nn) AS r " +
        "FROM nodes), " +
        "c1 AS (SELECT r0.t, r0.id, r0.r // deg.deg AS c FROM r0 " +
        "JOIN deg USING (t, id)), " +
        "s1 AS (SELECT ed.dt AS t, ed.did AS id, " +
        "CAST(SUM(c1.c) AS BIGINT) AS s FROM ed " +
        "JOIN c1 ON ed.st = c1.t AND ed.sid = c1.id GROUP BY 1, 2), " +
        "r1 AS (SELECT n2.t, n2.id, " +
        "(SELECT (15 * (1000000000000 // nn.n)) // 100 FROM nn) + " +
        "(85 * COALESCE(s1.s, 0)) // 100 AS r FROM nodes n2 " +
        "LEFT JOIN s1 USING (t, id)), " +
        "c2 AS (SELECT r1.t, r1.id, r1.r // deg.deg AS c FROM r1 " +
        "JOIN deg USING (t, id)), " +
        "s2 AS (SELECT ed.dt AS t, ed.did AS id, " +
        "CAST(SUM(c2.c) AS BIGINT) AS s FROM ed " +
        "JOIN c2 ON ed.st = c2.t AND ed.sid = c2.id GROUP BY 1, 2), " +
        "r2 AS (SELECT n2.t, n2.id, " +
        "(SELECT (15 * (1000000000000 // nn.n)) // 100 FROM nn) + " +
        "(85 * COALESCE(s2.s, 0)) // 100 AS r FROM nodes n2 " +
        "LEFT JOIN s2 USING (t, id)) " +
        "SELECT t, id, r AS rank_fp, CAST(r AS DOUBLE) / 1e12 AS rank " +
        "FROM r2 ORDER BY t, id"),
    // trailing sums are BIGINT-exact; one pinned double formula for
    // mean/var/z so both engines round identically
    "q143_rate_anomaly" ->
      ("WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), " +
        "w AS (SELECT *, COUNT(n) OVER win AS c, " +
        "CAST(SUM(n) OVER win AS BIGINT) AS s, " +
        "CAST(SUM(n * n) OVER win AS BIGINT) AS ss FROM daily " +
        "WINDOW win AS (PARTITION BY event_type ORDER BY day " +
        "ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) " +
        "SELECT event_type, CAST(day AS VARCHAR) AS day, n, " +
        "CASE WHEN CAST(ss AS DOUBLE) / CAST(c AS DOUBLE) - " +
        "(CAST(s AS DOUBLE) / CAST(c AS DOUBLE)) * " +
        "(CAST(s AS DOUBLE) / CAST(c AS DOUBLE)) > 0 THEN " +
        "(CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / CAST(c AS DOUBLE)) " +
        "/ sqrt(CAST(ss AS DOUBLE) / CAST(c AS DOUBLE) - " +
        "(CAST(s AS DOUBLE) / CAST(c AS DOUBLE)) * " +
        "(CAST(s AS DOUBLE) / CAST(c AS DOUBLE))) ELSE 0.0 END AS z " +
        "FROM w WHERE c = 7 ORDER BY event_type, day"),
    // q208: EWMA anomaly — lag-j weight 3^(j-1)·4^(8-j) keeps num/den
    // integer-exact; spike decision n·den > 2·num never rounds.
    // q210 (streaming maintenance of the same daily ledger) shares it
    // verbatim: the sum-merge drains to the batch daily table
    "q208_ewma_anomaly" -> q208Sql,
    "q210_streaming_ewma" -> q208Sql,
    // q214: running conditional MAX = latest prior click (frame is
    // time-ordered, no IGNORE NULLS); money summed as integer cents.
    // q215 (streaming maintenance with per-user click state) shares it
    // verbatim: state re-enters with original (ts, event_id), so any
    // time-ordered batching drains to the batch rollup
    "q214_attribution" -> q214Sql,
    "q215_streaming_attribution" -> q214Sql,
    // q249: U-shaped multi-touch attribution — purchase value split
    // over the preceding hour's clicks (1 → 100%, 2 → 50/50, 3+ →
    // 40/40 + 20% shared by the middles); exact micro-unit longs with
    // one shared rounding formula for the middle share
    "q249_position_attribution" ->
      ("WITH c AS (SELECT user_id, ts AS c_ts, event_id AS c_id " +
        "FROM events WHERE event_type = 'click'), " +
        "p AS (SELECT user_id, ts AS p_ts, event_id AS p_id, " +
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents " +
        "FROM events WHERE event_type = 'purchase'), " +
        "m AS (SELECT p.p_id, p.p_ts, p.cents, " +
        "CAST(COUNT(c.c_id) AS BIGINT) AS m FROM p " +
        "LEFT JOIN c ON c.user_id = p.user_id " +
        "AND (c.c_ts < p.p_ts OR (c.c_ts = p.p_ts AND c.c_id < p.p_id)) " +
        "AND c.c_ts >= p.p_ts - INTERVAL 3600 SECOND " +
        "GROUP BY 1, 2, 3), " +
        "cr AS (SELECT p_ts, m, " +
        "CASE WHEN m = 0 THEN 0 WHEN m = 1 THEN cents * 1000000 " +
        "WHEN m = 2 THEN cents * 500000 ELSE cents * 400000 END AS fc, " +
        "CASE WHEN m <= 1 THEN 0 WHEN m = 2 THEN cents * 500000 " +
        "ELSE cents * 400000 END AS lc, " +
        "CASE WHEN m <= 2 THEN 0 ELSE (m - 2) * " +
        "CAST(FLOOR(CAST(cents AS DOUBLE) * 200000.0 / " +
        "CAST(m - 2 AS DOUBLE) + 0.5) AS BIGINT) END AS mc FROM m) " +
        "SELECT CAST(CAST(p_ts AS DATE) AS VARCHAR) AS day, " +
        "CAST(COUNT(*) AS BIGINT) AS n_purchases, " +
        "CAST(SUM(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_attributed, " +
        "CAST(SUM(fc) AS BIGINT) AS first_credit_micro, " +
        "CAST(SUM(lc) AS BIGINT) AS last_credit_micro, " +
        "CAST(SUM(mc) AS BIGINT) AS mid_credit_micro " +
        "FROM cr GROUP BY 1 ORDER BY day"),
    // q250: forward as-of — time from each click to the user's next
    // purchase; the oracle is the classic join + argmin form, pinning
    // the engine's reverse-window linear plan (the q221 discipline)
    "q250_conversion_latency" ->
      ("WITH c AS (SELECT user_id, ts AS c_ts, event_id AS c_id " +
        "FROM events WHERE event_type = 'click'), " +
        "p AS (SELECT user_id, ts AS p_ts, event_id AS p_id " +
        "FROM events WHERE event_type = 'purchase'), " +
        "j AS (SELECT c.user_id, c.c_ts, c.c_id, MIN(p.p_ts) AS np " +
        "FROM c LEFT JOIN p ON p.user_id = c.user_id " +
        "AND (p.p_ts > c.c_ts OR (p.p_ts = c.c_ts AND p.p_id > c.c_id)) " +
        "GROUP BY 1, 2, 3), " +
        "l AS (SELECT c_ts, CASE WHEN np IS NOT NULL THEN " +
        "CAST(FLOOR((epoch_us(CAST(np AS TIMESTAMP)) - " +
        "epoch_us(CAST(c_ts AS TIMESTAMP))) / 1000000.0) AS BIGINT) " +
        "END AS lat_sec FROM j), " +
        "f AS (SELECT CAST(c_ts AS DATE) AS day, " +
        "CASE WHEN lat_sec IS NOT NULL AND lat_sec <= 3600 " +
        "THEN 1 ELSE 0 END AS conv, lat_sec FROM l) " +
        "SELECT CAST(day AS VARCHAR) AS day, " +
        "CAST(COUNT(*) AS BIGINT) AS n_clicks, " +
        "CAST(SUM(conv) AS BIGINT) AS n_converted, " +
        "CAST(SUM(conv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) " +
        "AS conversion_rate, " +
        "CAST(COALESCE(SUM(CASE WHEN conv = 1 THEN lat_sec END), 0) " +
        "AS BIGINT) AS total_latency_sec, " +
        "CAST(COALESCE(MAX(CASE WHEN conv = 1 THEN lat_sec END), 0) " +
        "AS BIGINT) AS max_latency_sec " +
        "FROM f GROUP BY day ORDER BY day"),
    // q189: daily top-3 leaderboard with rank movement vs the previous
    // OBSERVED day (prev_rk 0 = first appearance); ranks computed over
    // the FULL daily table before the top-k filter
    "q189_event_trending" ->
      ("WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), " +
        "r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY day " +
        "ORDER BY n DESC, event_type) AS BIGINT) AS rk FROM daily), " +
        "p AS (SELECT *, CAST(COALESCE(LAG(rk, 1) OVER " +
        "(PARTITION BY event_type ORDER BY day), 0) AS BIGINT) " +
        "AS prev_rk FROM r) " +
        "SELECT CAST(day AS VARCHAR) AS day, rk, event_type, n, " +
        "prev_rk, CAST(prev_rk - rk AS BIGINT) AS rk_delta " +
        "FROM p WHERE rk <= 3 ORDER BY day, rk"),
    // q20's session CTEs; stage anchors are exact min event ids
    // (fixture event ids are strictly time-ordered)
    "q144_session_funnel" -> q144Sql,
    // q277: q144 per micro-batch (session anchors + per-session stage
    // state under the arrival contract) — shares q144's oracle
    "q277_streaming_funnel" -> q144Sql,
    
    // q166: retention triangle — first-activity cohorts, exact counts,
    // cohort date emitted as an ISO string on both engines
    "q166_retention_cohorts" -> q166Sql,
    // q276: q166 per micro-batch (distinct-merged (user, date) state,
    // idempotent + order-insensitive) — shares q166's oracle verbatim
    "q276_streaming_retention" -> q166Sql,
    // q221: event-grain as-of attribution — the oracle is the CLASSIC
    // as-of JOIN (purchase ⋈ strictly-earlier clicks by (ts, id)
    // order, argmax click ts, 1-hour horizon); the engine's linear
    // window plan must reproduce it row-for-row
    "q221_asof_attribution" ->
      ("WITH e AS (SELECT user_id, ts, event_id, event_type FROM events), " +
        "p AS (SELECT user_id, ts AS pts, event_id AS pid FROM e " +
        "WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id AS cuser, ts AS cts, event_id AS cid " +
        "FROM e WHERE event_type = 'click'), " +
        "j AS (SELECT p.pid, p.user_id, p.pts, MAX(c.cts) AS src_ts " +
        "FROM p LEFT JOIN c ON c.cuser = p.user_id " +
        "AND (c.cts < p.pts OR (c.cts = p.pts AND c.cid < p.pid)) " +
        "GROUP BY p.pid, p.user_id, p.pts) " +
        "SELECT pid AS event_id, user_id, " +
        "strftime(pts, '%Y-%m-%d %H:%M:%S') AS purchase_ts, " +
        "strftime(src_ts, '%Y-%m-%d %H:%M:%S') AS click_ts, " +
        "CAST(CASE WHEN src_ts IS NOT NULL " +
        "AND pts <= src_ts + INTERVAL 1 HOUR THEN 1 ELSE 0 END " +
        "AS BIGINT) AS attributed FROM j ORDER BY event_id"),
    // q257: retry-burst debounce — suppress when the previous RAW
    // (user, type) event lies within the gap; one lag, exact micros
    "q257_event_debounce" -> q257Sql,
    // q261: q257 per micro-batch (last-event state + gated count
    // ledger) — shares q257's oracle verbatim
    "q261_streaming_debounce" -> q257Sql,
    // q260: log2 histogram of same-(user, type) inter-event gaps —
    // the distribution that sizes the debounce gap / session timeout /
    // watermark delay; exact integer log2 via the bit-length identity
    "q260_event_gap_histogram" -> q260Sql,
    // q262: q260 per micro-batch (last-event anchors + gated
    // histogram ledger) — shares q260's oracle verbatim
    "q262_streaming_gap_histogram" -> q260Sql,
    // q259: cumulative distinct-user curve — exact via first-seen-day
    // prefix sum (never rescans history), estimated via cumulative
    // max-merge of the q222 md5 registers; same BIGINT harmonic sums
    "q259_hll_user_curve" -> q259Sql,
    // q268: 3-step session paths, counted and totally ranked — q198's
    // session CTEs with a second LAG; rank ties break on the path
    "q268_event_path_trigrams" ->
      ("WITH g AS (SELECT user_id, ts, event_id, event_type, " +
        "CASE WHEN LAG(ts) OVER w IS NULL OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS new_session FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM g), " +
        "tr AS (SELECT LAG(event_type, 2) OVER ws AS from2, " +
        "LAG(event_type, 1) OVER ws AS from1, event_type AS to_type " +
        "FROM s WINDOW ws AS " +
        "(PARTITION BY user_id, session_id ORDER BY ts, event_id)), " +
        "c AS (SELECT from2, from1, to_type, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM tr " +
        "WHERE from2 IS NOT NULL GROUP BY 1, 2, 3) " +
        "SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, from2, " +
        "from1, to_type) AS BIGINT) AS rank, " +
        "from2, from1, to_type, n FROM c ORDER BY rank"),
    // q271: log2 histogram of events-per-session over q20's sessions
    // — the bit-length bucket rule on the session grain
    "q271_session_size_histogram" -> q271Sql,
    // q283: q271 per micro-batch (per-session counts sum-merge
    // through the funnel-stages state) — shares q271's oracle
    "q283_streaming_session_sizes" -> q271Sql,
    
    // q272: q257's kept rate at four candidate gaps from one lag —
    // the oracle evaluates the grid via a cross join; the engine uses
    // conditional sums + stack (same cells)
    "q272_debounce_gap_sweep" ->
      ("WITH l AS (SELECT event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) - " +
        "epoch_us(CAST(LAG(ts) OVER (PARTITION BY user_id, event_type " +
        "ORDER BY ts, event_id) AS TIMESTAMP)) AS gap_us FROM events), " +
        "gr AS (SELECT unnest([60, 600, 3600, 14400]) AS gap_sec) " +
        "SELECT event_type, CAST(gap_sec AS BIGINT) AS gap_sec, " +
        "CAST(COUNT(*) AS BIGINT) AS n_events, " +
        "CAST(SUM(CASE WHEN gap_us IS NOT NULL AND " +
        "gap_us <= CAST(gap_sec AS BIGINT) * 1000000 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_suppressed, " +
        "CAST(COUNT(*) - SUM(CASE WHEN gap_us IS NOT NULL AND " +
        "gap_us <= CAST(gap_sec AS BIGINT) * 1000000 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_kept, " +
        "CAST(COUNT(*) - SUM(CASE WHEN gap_us IS NOT NULL AND " +
        "gap_us <= CAST(gap_sec AS BIGINT) * 1000000 THEN 1 ELSE 0 END) AS DOUBLE) / " +
        "CAST(COUNT(*) AS DOUBLE) AS kept_rate " +
        "FROM l CROSS JOIN gr GROUP BY 1, 2 " +
        "ORDER BY event_type, gap_sec"),
    // q266: per from-type entropy/perplexity of the q198 transition
    // matrix — the q198 CTE chain verbatim plus a #types-row rollup;
    // the checker's 9-decimal rounding absorbs ln fold-order drift
    // exactly as for q173/q158
    "q266_transition_entropy" ->
      ("WITH g AS (SELECT user_id, ts, event_id, event_type, " +
        "CASE WHEN LAG(ts) OVER w IS NULL OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS new_session FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM g), " +
        "tr AS (SELECT LAG(event_type) OVER " +
        "(PARTITION BY user_id, session_id ORDER BY ts, event_id) " +
        "AS from_type, event_type AS to_type FROM s), " +
        "c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM tr WHERE from_type IS NOT NULL GROUP BY 1, 2), " +
        "pr AS (SELECT from_type, to_type, n, " +
        "CAST(n AS DOUBLE) / CAST(SUM(n) OVER " +
        "(PARTITION BY from_type) AS DOUBLE) AS p FROM c) " +
        "SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_total, " +
        "CAST(COUNT(*) AS BIGINT) AS n_dest, MAX(p) AS top_p, " +
        "-SUM(p * ln(p)) AS entropy, exp(-SUM(p * ln(p))) AS perplexity " +
        "FROM pr GROUP BY from_type ORDER BY from_type"),
    // q278: exact stage-latency deciles for the two q144 funnel
    // transitions — the q144 CTE chain with ts mins + the q200
    // decile-selection arithmetic over a (transition, gap) histogram
    "q278_funnel_latency_deciles" -> q278Sql,
    // q285: q278 per micro-batch (stage-timestamp state + the exact
    // decile fold at drain) — shares q278's oracle verbatim
    "q285_streaming_funnel_latency" -> q278Sql,
    
    // q280: cohort x age revenue + cumulative LTV per acquired user —
    // exact cents (the q274 discipline) on the lifecycle grain
    "q280_cohort_ltv" -> q280Sql,
    // q284: q280 per micro-batch ((user, day, cents) sum-merge
    // through a gated ledger) — shares q280's oracle verbatim
    "q284_streaming_cohort_ltv" -> q280Sql,
    
    // q281: day-of-week baseline + residual z anomaly — exact integer
    // dow via (epoch_day + 4) % 7, population variance from Σn / Σn²
    "q281_seasonal_baseline" -> q281Sql,
    // q297: q281 per micro-batch (the shared (type, day, n) count
    // state drains the weekday-baseline finish) — shares q281's SQL
    "q297_streaming_seasonal" -> q281Sql,
    // q282: funnel value by furthest stage — q144's chain plus exact
    // session cents; exclusive buckets partition q144's s0
    "q282_funnel_value_by_stage" ->
      ("WITH g0 AS (SELECT user_id, ts, event_id, event_type, value, " +
        "CASE WHEN LAG(ts) OVER w IS NULL OR " +
        "ts > LAG(ts) OVER w + INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS new_session FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "g AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW) AS session_id FROM g0), " +
        "cents AS (SELECT user_id, session_id, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) " +
        "AS cents FROM g GROUP BY 1, 2), " +
        "tv AS (SELECT user_id, session_id, MIN(event_id) AS tv " +
        "FROM g WHERE event_type = 'view' GROUP BY 1, 2), " +
        "tc AS (SELECT g.user_id, g.session_id, " +
        "MIN(g.event_id) AS tc FROM g JOIN tv " +
        "ON g.user_id = tv.user_id AND g.session_id = tv.session_id " +
        "WHERE g.event_type = 'click' AND g.event_id > tv.tv " +
        "GROUP BY 1, 2), " +
        "tp AS (SELECT g.user_id, g.session_id, " +
        "MIN(g.event_id) AS tp FROM g JOIN tc " +
        "ON g.user_id = tc.user_id AND g.session_id = tc.session_id " +
        "WHERE g.event_type = 'purchase' AND g.event_id > tc.tc " +
        "GROUP BY 1, 2), " +
        "st AS (SELECT c.user_id, c.session_id, c.cents, " +
        "CASE WHEN tp.tp IS NOT NULL THEN 'f3_purchased' " +
        "WHEN tc.tc IS NOT NULL THEN 'f2_click_no_purchase' " +
        "WHEN tv.tv IS NOT NULL THEN 'f1_view_only' " +
        "ELSE 'f0_no_view' END AS stage FROM cents c " +
        "LEFT JOIN tv ON c.user_id = tv.user_id " +
        "AND c.session_id = tv.session_id " +
        "LEFT JOIN tc ON c.user_id = tc.user_id " +
        "AND c.session_id = tc.session_id " +
        "LEFT JOIN tp ON c.user_id = tp.user_id " +
        "AND c.session_id = tp.session_id) " +
        "SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_sessions, " +
        "CAST(SUM(cents) AS BIGINT) AS cents FROM st " +
        "GROUP BY 1 ORDER BY stage"),
    // q273: per-day new/retained/resurrected/churned split — one
    // user-partitioned lag+lead over the (user, day) grain
    "q273_growth_accounting" -> q273Sql,
    // q300: q273 per micro-batch (distinct-merged (user, day) grain)
    // — shares q273's SQL verbatim
    "q300_streaming_growth" -> q273Sql,
    // q274: RFM log2 cells — recency vs the corpus max day, money in
    // exact cents (the decimal(18,2) discipline), bit-length buckets
    "q274_rfm_segments" -> q274Sql,
    // q279: q274 per micro-batch (per-user max/sum-merged stats
    // through a gated ledger) — shares q274's oracle verbatim
    "q279_streaming_rfm" -> q274Sql,
    // q275: DAU vs trailing-7-day WAU per observed day — the range
    // join runs on the day grain, never the event grain
    "q275_dau_wau_stickiness" -> q275Sql,
    // q301: q275 per micro-batch off the same (user, day) grain —
    // shares q275's SQL verbatim
    "q301_streaming_stickiness" -> q275Sql,
    // q290: per-day peak concurrent sessions — the q20 session CTEs,
    // sessions as closed intervals (+1/−1 boundaries, starts before
    // ends at a tie), one global running sum grouped by day
    "q290_session_concurrency" -> q290Sql,
    // q298: q290 per micro-batch (session endpoints min/max-merge
    // through the funnel-stages state) — shares q290's SQL verbatim
    "q298_streaming_concurrency" -> q290Sql,
    // q291: Kaplan-Meier tenure table — censoring at the corpus max
    // day, at-risk via a tenure-grain suffix sum; hazard is the one
    // division
    "q291_survival_hazard" -> q291Sql,
    // q295: q291 per micro-batch (per-user span min/max-merge) —
    // shares q291's SQL verbatim
    "q295_streaming_survival" -> q291Sql,
    // q292: integer CUSUM over the DENSE (type, day) count grid —
    // denominators cleared (y = D·n − T), closed form
    // S = P − min(0, running min P), all BIGINT to one division
    "q292_cusum_shift" -> q292Sql,
    // q296: q292 per micro-batch (the shared (type, day, n) count
    // state drains the CUSUM finish) — shares q292's SQL verbatim
    "q296_streaming_cusum" -> q292Sql,
    // q293: referential orphan audit — one key-grain collapse + one
    // LEFT JOIN ... IS NULL per FK edge (the anti-join convention:
    // a NULL child key never matches, so it counts as orphaned)
    "q293_fk_integrity" ->
      (Seq(
        fkEdge("lineitem", "l_orderkey", "orders", "o_orderkey"),
        fkEdge("lineitem", "l_partkey", "part", "p_partkey"),
        fkEdge("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        fkEdge("orders", "o_custkey", "customer", "c_custkey"),
        fkEdge("customer", "c_nationkey", "nation", "n_nationkey"),
        fkEdge("supplier", "s_nationkey", "nation", "n_nationkey"),
        fkEdge("nation", "n_regionkey", "region", "r_regionkey"))
        .mkString("", " UNION ALL ", " ORDER BY relation")),
    // q294: join-key multiplicity stats — key-grain collapse then a
    // 3-value fold per audited key
    "q294_join_key_skew" ->
      (Seq(
        skewKey("lineitem", "l_orderkey"),
        skewKey("lineitem", "l_partkey"),
        skewKey("lineitem", "l_suppkey"),
        skewKey("orders", "o_custkey"),
        skewKey("events", "user_id"),
        skewKey("events", "event_type"),
        skewKey("documents", "source"))
        .mkString("", " UNION ALL ", " ORDER BY key_name")),
    // q299: exact Gini via the tie-group rank identity over the value
    // histogram — HUGEINT weighted sums (the engine's decimal(38,0)),
    // one final division
    "q299_activity_gini" -> q299Sql,
    // q303: q299 per micro-batch off the q279 rfm state family —
    // shares q299's SQL verbatim
    "q303_streaming_gini" -> q299Sql,
    // q315: TPC-H Q4 shape — late-shipment audit per priority
    "q315_late_priority" -> q315Sql,
    // q324: q315 per micro-batch (late set distinct-merges) —
    // shares q315's oracle verbatim
    "q324_streaming_late_priority" -> q315Sql,
    // q316: TPC-H Q10 shape — top-20 returned-revenue customers;
    // total order (revenue desc, custkey) pins the LIMIT
    "q316_returned_revenue" -> q316Sql,
    // q322: q316 per micro-batch (customer cent sums merge) —
    // shares q316's oracle verbatim
    "q322_streaming_returned_revenue" -> q316Sql,
    // q317: TPC-H Q14 shape — monthly PROMO revenue share
    "q317_promo_share" -> q317Sql,
    // q321: q317 per micro-batch (month cells merge) — shares
    // q317's oracle verbatim
    "q321_streaming_promo_share" -> q317Sql,
    // q318: TPC-H Q15 shape — max-revenue suppliers over a fixed
    // quarter, full tie set on exact decimal equality
    "q318_top_supplier" -> q318Sql,
    // q323: q318 per micro-batch (supplier sums merge) — shares
    // q318's oracle verbatim
    "q323_streaming_top_supplier" -> q318Sql,
    // q319: TPC-H Q17 shape — the half-of-average threshold is
    // cross-multiplied (2·n·qty < Σqty), no division anywhere
    "q319_small_quantity_brand" -> q319Sql,
    // q365: TPC-H Q6 shape — one filtered scan, one decimal sum; the
    // discount band compares in integer cents so the edges are exact
    "q365_forecast_revenue" -> q365Sql,
    // q369: q365 per micro-batch (the single cell sum-merges) —
    // shares q365's oracle verbatim
    "q369_streaming_forecast_revenue" -> q365Sql,
    // q366: TPC-H Q13 shape — recent order-count histogram, zero
    // bucket included via the left join
    "q366_order_count_distribution" ->
      ("WITH ocd AS (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count " +
        "FROM customer c LEFT JOIN (SELECT o_custkey, o_orderkey " +
        "FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01') o " +
        "ON o.o_custkey = c.c_custkey GROUP BY c.c_custkey) " +
        "SELECT c_count, COUNT(*) AS n_custs FROM ocd " +
        "GROUP BY c_count ORDER BY n_custs DESC, c_count DESC"),
    // q367: TPC-H Q18 shape — per-order quantity sums at the 250
    // threshold, customer resolved
    "q367_large_volume_customers" -> q367Sql,
    // q370: q367 per micro-batch (per-order sums merge even when an
    // order's lines span batches) — shares q367's oracle verbatim
    "q370_streaming_large_volume" -> q367Sql,
    // q371: TPC-H Q7 shape — cross-nation revenue within EUROPE by
    // ship year
    "q371_volume_shipping" -> q371Sql,
    // q374: q371 per micro-batch (nation-pair-year cells merge) —
    // shares q371's oracle verbatim
    "q374_streaming_volume_shipping" -> q371Sql,
    // q372: TPC-H Q8 shape — supplier-nation share per order year for
    // ASIA customers on PROMO parts; decimal sums, one final division
    "q372_market_share" ->
      ("WITH msc AS (SELECT YEAR(o.o_orderdate) AS o_year, " +
        "sn.n_name AS supp_nation, " +
        "SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "(CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) " +
        "AS rev FROM lineitem l " +
        "JOIN orders o ON o.o_orderkey = l.l_orderkey " +
        "JOIN customer c ON c.c_custkey = o.o_custkey " +
        "JOIN nation cn ON cn.n_nationkey = c.c_nationkey " +
        "JOIN region r ON r.r_regionkey = cn.n_regionkey " +
        "AND r.r_name = 'ASIA' " +
        "JOIN part p ON p.p_partkey = l.l_partkey " +
        "AND p.p_type = 'PROMO' " +
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey " +
        "JOIN nation sn ON sn.n_nationkey = s.s_nationkey " +
        "GROUP BY o_year, supp_nation) " +
        "SELECT o_year, supp_nation, CAST(rev AS DOUBLE) AS nation_rev, " +
        "CAST(SUM(rev) OVER (PARTITION BY o_year) AS DOUBLE) " +
        "AS total_rev, " +
        "CAST(rev AS DOUBLE) / " +
        "CAST(SUM(rev) OVER (PARTITION BY o_year) AS DOUBLE) " +
        "AS mkt_share FROM msc ORDER BY o_year, supp_nation"),
    // q373: TPC-H Q19 shape — disjunctive (brand, size, quantity)
    // bands, one cell
    "q373_disjunctive_revenue" -> q373Sql,
    // q375: q373 per micro-batch (the cell merges) — shares q373's
    "q375_streaming_disjunctive_revenue" -> q373Sql,
    // q381: brand-pair support + lift off the distinct (order, brand)
    // grain — integer products, one double division
    "q381_brand_affinity" -> (bkCtes +
      " SELECT brand_a, brand_b, n_cooc, n_a, n_b, " +
      "CAST(n_cooc * n_orders AS DOUBLE) / " +
      "CAST(n_a * n_b AS DOUBLE) AS lift " +
      "FROM bkl ORDER BY brand_a, brand_b"),
    // q384: the grain distinct-merges per micro-batch — shares q381's
    "q384_streaming_brand_affinity" -> (bkCtes +
      " SELECT brand_a, brand_b, n_cooc, n_a, n_b, " +
      "CAST(n_cooc * n_orders AS DOUBLE) / " +
      "CAST(n_a * n_b AS DOUBLE) AS lift " +
      "FROM bkl ORDER BY brand_a, brand_b"),
    // q382: symmetrized pairs ranked by lift within brand (partner
    // breaks ties), top 3
    "q382_top_affinities" -> (bkCtes +
      ", bksym AS (SELECT brand_a AS brand, brand_b AS partner, " +
      "n_cooc, CAST(n_cooc * n_orders AS DOUBLE) / " +
      "CAST(n_a * n_b AS DOUBLE) AS lift FROM bkl " +
      "UNION ALL SELECT brand_b, brand_a, n_cooc, " +
      "CAST(n_cooc * n_orders AS DOUBLE) / " +
      "CAST(n_a * n_b AS DOUBLE) FROM bkl), " +
      "bkrk AS (SELECT brand, partner, n_cooc, lift, " +
      "ROW_NUMBER() OVER (PARTITION BY brand " +
      "ORDER BY lift DESC, partner) AS rk FROM bksym) " +
      "SELECT brand, partner, n_cooc, lift, CAST(rk AS BIGINT) AS rank " +
      "FROM bkrk WHERE rk <= 3 ORDER BY brand, rank"),
    // q383: distinct brands per order -> order-count histogram
    "q383_basket_sizes" -> bkSizesSql,
    // q385: q383 off the same maintained state — shares its SQL
    "q385_streaming_basket_sizes" -> bkSizesSql,
    // q368: TPC-H Q22 shape — above-positive-mean balances with no
    // recent orders; the mean is cross-multiplied (bal·n > Σ), no
    // division anywhere
    "q368_idle_balance_audit" ->
      ("WITH ibp AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS sp, " +
        "COUNT(*) AS np FROM customer WHERE c_acctbal > 0), " +
        "ibr AS (SELECT DISTINCT o_custkey FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '2001-01-01') " +
        "SELECT c_mktsegment, COUNT(*) AS n_custs, " +
        "CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) " +
        "AS balance_mass " +
        "FROM customer, ibp " +
        "WHERE CAST(c_acctbal AS DECIMAL(12,2)) * ibp.np > ibp.sp " +
        "AND c_custkey NOT IN (SELECT o_custkey FROM ibr) " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    // q340: q319 per micro-batch ((part, qty, brand) cells merge;
    // threshold at drain) — shares q319's oracle verbatim
    "q340_streaming_small_quantity" -> q319Sql,
    // q338: stationary distribution of the q198 chain — K-round power
    // iteration with renormalization, generated CTE rounds (the q327
    // determinism discipline on a stochastic matrix)
    "q338_markov_stationary" -> q338Sql,
    // q343: q338 per micro-batch off the q269 transition-count state
    // — shares q338's oracle verbatim
    "q343_streaming_markov" -> q338Sql,
    // q339: conversion rate per q274 RFM cell — the targeting table
    "q339_segment_conversion" -> q339Sql,
    // q344: q339 per micro-batch off the rfm state (purchase flag
    // max-merges) — shares q339's oracle verbatim
    "q344_streaming_segment_conversion" -> q339Sql,
    // q334: Benford first-digit audit — digit from the exact decimal
    // string rendering (no float-log10 boundary risk), χ² shared
    "q334_benford_audit" -> q334Sql,
    // q341: q334 per micro-batch (events cells merge + static orders
    // at drain) — shares q334's oracle verbatim
    "q341_streaming_benford" -> q334Sql,
    // q328: daily OHLC candlesticks — open/close by the total
    // (ts, event_id) order, exact decimal volume
    "q328_ohlc_daily" -> q328Sql,
    // q329: q328 per micro-batch (the OHLC statistic merges exactly)
    // — shares q328's oracle verbatim
    "q329_streaming_ohlc" -> q328Sql,
    // q304: exact Lorenz deciles — the same giniCtes rank machinery,
    // decile ranks range-joined into the value histogram
    "q304_lorenz_deciles" ->
      ("WITH " + Seq(
        giniCtes("(SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x " +
          "FROM events GROUP BY 1)", "g1"),
        giniCtes("(SELECT user_id, " +
          "CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS x " +
          "FROM events GROUP BY 1)", "g2"),
        giniCtes("(SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS x " +
          "FROM orders GROUP BY 1)", "g3")).mkString(", ") + " " +
        Seq(lorenzSelect("events_per_user", "g1"),
          lorenzSelect("cents_per_user", "g2"),
          lorenzSelect("orders_per_customer", "g3"))
          .mkString(" UNION ALL ") + " ORDER BY entity, decile"),
  )

  /** The q299 per-entity CTE chain: per-key values → value histogram
    * → tie-group rank bases → HUGEINT weighted sums.
    */
  private def giniCtes(perKeySql: String, p: String): String =
    (s"${p}bv AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS m " +
      s"FROM $perKeySql GROUP BY 1), " +
      s"${p}r AS (SELECT x, m, " +
      s"COALESCE(SUM(m) OVER wp, CAST(0 AS BIGINT)) AS rbase, " +
      "COALESCE(SUM(CAST(x AS HUGEINT) * m) OVER wp, " +
      s"CAST(0 AS HUGEINT)) AS cb FROM ${p}bv " +
      "WINDOW wp AS (ORDER BY x " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), " +
      s"${p}a AS (SELECT SUM(CAST(x AS HUGEINT) * " +
      "(CAST(m AS HUGEINT) * rbase + (CAST(m AS HUGEINT) * (m + 1)) // 2)) " +
      "AS sw, CAST(SUM(m) AS HUGEINT) AS n, " +
      s"SUM(CAST(x AS HUGEINT) * m) AS total FROM ${p}r)")

  private def q16Sql: String =
    ("SELECT l_returnflag, l_linestatus, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS sum_disc_price, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2))) * (CAST(1 AS DECIMAL(5,2)) + CAST(l_tax AS DECIMAL(5,2)))) AS DOUBLE) AS sum_charge, " +
        "COUNT(*) AS count_order FROM lineitem " +
        "WHERE l_shipdate <= TIMESTAMP '2001-09-02' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")

  private def q315Sql: String =
    ("WITH late AS (SELECT DISTINCT o.o_orderkey, o.o_orderpriority " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY), " +
        "lc AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) " +
        "AS n_late FROM late GROUP BY 1), " +
        "t AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) " +
        "AS n_orders FROM orders GROUP BY 1) " +
        "SELECT t.o_orderpriority, t.n_orders, " +
        "CAST(COALESCE(lc.n_late, 0) AS BIGINT) AS n_late, " +
        "CAST(COALESCE(lc.n_late, 0) AS DOUBLE) / " +
        "CAST(t.n_orders AS DOUBLE) AS late_rate " +
        "FROM t LEFT JOIN lc USING (o_orderpriority) " +
        "ORDER BY t.o_orderpriority")

  private def q316Sql: String =
    ("WITH rev AS (SELECT o.o_custkey, " +
        "SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * " +
        "(CAST(1 AS DECIMAL(5,2)) - CAST(l.l_discount AS DECIMAL(5,2)))) " +
        "AS revd FROM lineitem l JOIN orders o " +
        "ON l.l_orderkey = o.o_orderkey " +
        "WHERE l.l_returnflag = 'R' GROUP BY 1) " +
        "SELECT c.c_custkey, c.c_name, n.n_name, " +
        "CAST(rev.revd AS DOUBLE) AS revenue " +
        "FROM rev JOIN customer c ON rev.o_custkey = c.c_custkey " +
        "JOIN nation n ON c.c_nationkey = n.n_nationkey " +
        "ORDER BY revenue DESC, c.c_custkey LIMIT 20")

  private def q317Sql: String =
    ("WITH j AS (SELECT CAST(date_trunc('month', " +
        "CAST(l.l_shipdate AS DATE)) AS VARCHAR) AS ship_month, " +
        "p.p_type, " +
        "CAST(l.l_extendedprice AS DECIMAL(12,2)) * " +
        "(CAST(1 AS DECIMAL(5,2)) - CAST(l.l_discount AS DECIMAL(5,2))) " +
        "AS disc FROM lineitem l JOIN part p " +
        "ON l.l_partkey = p.p_partkey), " +
        "a AS (SELECT ship_month, CAST(COUNT(*) AS BIGINT) AS n_lines, " +
        "SUM(CASE WHEN p_type = 'PROMO' THEN disc " +
        "ELSE CAST(0 AS DECIMAL(12,2)) * CAST(1 AS DECIMAL(5,2)) END) " +
        "AS promo_rev, SUM(disc) AS total_rev FROM j GROUP BY 1) " +
        "SELECT ship_month, n_lines, " +
        "CAST(promo_rev AS DOUBLE) AS promo_revenue, " +
        "CAST(total_rev AS DOUBLE) AS total_revenue, " +
        "100.0 * CAST(promo_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) " +
        "AS promo_share_pct FROM a ORDER BY ship_month")

  private def q318Sql: String =
    ("WITH rev AS (SELECT l_suppkey, " +
        "SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "(CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) " +
        "AS revd FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1), " +
        "mx AS (SELECT MAX(revd) AS mx FROM rev) " +
        "SELECT s.s_suppkey, s.s_name, CAST(rev.revd AS DOUBLE) " +
        "AS revenue FROM rev CROSS JOIN mx " +
        "JOIN supplier s ON rev.l_suppkey = s.s_suppkey " +
        "WHERE rev.revd = mx.mx ORDER BY s.s_suppkey")

  private def q365Sql: String =
    "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "CAST(l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue, " +
      "COUNT(*) AS n_lines FROM lineitem " +
      "WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
      "AND l_shipdate < TIMESTAMP '1997-01-01' " +
      "AND CAST(ROUND(l_discount * 100) AS INTEGER) BETWEEN 5 AND 7 " +
      "AND l_quantity < 24"

  private def q367Sql: String =
    "WITH lvq AS (SELECT l_orderkey, " +
      "SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq FROM lineitem " +
      "GROUP BY l_orderkey HAVING " +
      "SUM(CAST(l_quantity AS DECIMAL(12,2))) >= 250) " +
      "SELECT c.c_name, c.c_custkey, o.o_orderkey, " +
      "CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS orderdate, " +
      "o.o_totalprice, CAST(lvq.sq AS DOUBLE) AS total_qty " +
      "FROM lvq JOIN orders o ON o.o_orderkey = lvq.l_orderkey " +
      "JOIN customer c ON c.c_custkey = o.o_custkey " +
      "ORDER BY total_qty DESC, o.o_orderkey"

  /** The market-basket chain: distinct (order, brand) grain, order
    * total, per-brand marginals, pair support with marginals attached
    * (`bkl`). Prefix `bk` is unique to this family.
    */
  private def bkCtes: String =
    "WITH bkob AS (SELECT DISTINCT l_orderkey, p_brand FROM lineitem l " +
      "JOIN part p ON p.p_partkey = l.l_partkey), " +
      "bkn AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM bkob), " +
      "bkpb AS (SELECT p_brand, COUNT(*) AS n_brand FROM bkob " +
      "GROUP BY p_brand), " +
      "bkl AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, " +
      "COUNT(*) AS n_cooc, ANY_VALUE(na.n_brand) AS n_a, " +
      "ANY_VALUE(nb.n_brand) AS n_b, ANY_VALUE(bkn.n_orders) AS n_orders " +
      "FROM bkob a JOIN bkob b ON a.l_orderkey = b.l_orderkey " +
      "AND a.p_brand < b.p_brand " +
      "JOIN bkpb na ON na.p_brand = a.p_brand " +
      "JOIN bkpb nb ON nb.p_brand = b.p_brand CROSS JOIN bkn " +
      "GROUP BY a.p_brand, b.p_brand)"

  private def bkSizesSql: String =
    "WITH bkob AS (SELECT DISTINCT l_orderkey, p_brand FROM lineitem l " +
      "JOIN part p ON p.p_partkey = l.l_partkey) " +
      "SELECT n_brands, COUNT(*) AS n_orders FROM " +
      "(SELECT l_orderkey, COUNT(*) AS n_brands FROM bkob " +
      "GROUP BY l_orderkey) bkbs GROUP BY n_brands ORDER BY n_brands"

  private def q371Sql: String =
    "WITH vsn AS (SELECT n_nationkey, n_name FROM nation " +
      "JOIN region ON r_regionkey = n_regionkey " +
      "WHERE r_name = 'EUROPE') " +
      "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, " +
      "YEAR(l_shipdate) AS l_year, " +
      "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "(CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) " +
      "AS DOUBLE) AS revenue, COUNT(*) AS n_lines " +
      "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey " +
      "JOIN customer c ON c.c_custkey = o.o_custkey " +
      "JOIN supplier s ON s.s_suppkey = l.l_suppkey " +
      "JOIN vsn sn ON sn.n_nationkey = s.s_nationkey " +
      "JOIN vsn cn ON cn.n_nationkey = c.c_nationkey " +
      "WHERE sn.n_name <> cn.n_name " +
      "GROUP BY supp_nation, cust_nation, l_year " +
      "ORDER BY supp_nation, cust_nation, l_year"

  private def q373Sql: String =
    "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "(CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) " +
      "AS DOUBLE) AS revenue, COUNT(*) AS n_lines " +
      "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey " +
      "WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 " +
      "AND l_quantity BETWEEN 1 AND 11) " +
      "OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25 " +
      "AND l_quantity BETWEEN 10 AND 20) " +
      "OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35 " +
      "AND l_quantity BETWEEN 20 AND 30)"

  private def q319Sql: String =
      ("WITH pa AS (SELECT l_partkey, " +
        "SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1) " +
        "SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_small_lines, " +
        "CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) " +
        "AS revenue " +
        "FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey " +
        "JOIN part p ON l.l_partkey = p.p_partkey " +
        "WHERE CAST(l.l_quantity AS DECIMAL(12,2)) * 2 * pa.n < pa.sq " +
        "GROUP BY 1 ORDER BY p.p_brand")

  private def q334Sql: String =
      ("WITH c AS (SELECT 'orders.o_totalprice' AS entity, " +
        "CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) " +
        "AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM orders " +
        "WHERE CAST(o_totalprice AS DECIMAL(18,2)) >= 1 " +
        "UNION ALL SELECT 'events.value', " +
        "CAST(substr(CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR), " +
        "1, 1) AS BIGINT) FROM events " +
        "WHERE CAST(value AS DECIMAL(18,2)) >= 1), " +
        "g AS (SELECT entity, digit, CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM c GROUP BY 1, 2), " +
        "t AS (SELECT entity, CAST(SUM(n) AS BIGINT) AS nt " +
        "FROM g GROUP BY 1), " +
        "e AS (SELECT g.entity, g.digit, g.n, t.nt, " +
        "log10(1.0 + 1.0 / CAST(g.digit AS DOUBLE)) AS expected " +
        "FROM g JOIN t USING (entity)), " +
        "x AS (SELECT *, (CAST(n AS DOUBLE) - expected * " +
        "CAST(nt AS DOUBLE)) * (CAST(n AS DOUBLE) - expected * " +
        "CAST(nt AS DOUBLE)) / (expected * CAST(nt AS DOUBLE)) " +
        "AS dev FROM e), " +
        "ch AS (SELECT entity, SUM(dev) AS chi2 FROM x GROUP BY 1) " +
        "SELECT x.entity, x.digit, x.n, " +
        "CAST(x.n AS DOUBLE) / CAST(x.nt AS DOUBLE) AS share, " +
        "x.expected, ch.chi2 FROM x JOIN ch USING (entity) " +
        "ORDER BY x.entity, x.digit")

  private def q338Sql: String =
      ("WITH tr AS (SELECT user_id, ts, event_id, event_type, " +
        "LAG(event_type) OVER w AS from_type, LAG(ts) OVER w AS prev_ts " +
        "FROM events WINDOW w AS " +
        "(PARTITION BY user_id ORDER BY ts, event_id)), " +
        "c AS (SELECT from_type, event_type AS to_type, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM tr " +
        "WHERE from_type IS NOT NULL AND " +
        "ts <= prev_ts + INTERVAL 30 MINUTE GROUP BY 1, 2), " +
        "rs AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS rs " +
        "FROM c GROUP BY 1), " +
        "m AS (SELECT c.from_type, c.to_type, " +
        "CAST(c.n AS DOUBLE) / CAST(rs.rs AS DOUBLE) AS pt " +
        "FROM c JOIN rs USING (from_type)), " +
        "ty AS (SELECT DISTINCT t FROM " +
        "(SELECT from_type AS t FROM c UNION ALL SELECT to_type FROM c)), " +
        "p0 AS (SELECT t, 1.0 / " +
        "CAST((SELECT COUNT(*) FROM ty) AS DOUBLE) AS p FROM ty), " +
        mkvRounds(10) +
        " SELECT p10.t AS event_type, " +
        "CAST(COALESCE(rs.rs, 0) AS BIGINT) AS n_out, " +
        "p10.p AS stationary_p FROM p10 " +
        "LEFT JOIN rs ON p10.t = rs.from_type ORDER BY event_type")

  private def q339Sql: String =
      ("WITH pu AS (SELECT user_id, " +
        "MAX(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS last_day, " +
        "CAST(COUNT(*) AS BIGINT) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents " +
        "FROM events GROUP BY 1), " +
        "cv AS (SELECT DISTINCT user_id FROM events " +
        "WHERE event_type = 'purchase'), " +
        "r AS (SELECT pu.*, (SELECT MAX(last_day) FROM pu) - last_day " +
        "AS recency, CASE WHEN cv.user_id IS NULL THEN 0 ELSE 1 END " +
        "AS converted FROM pu LEFT JOIN cv ON pu.user_id = cv.user_id), " +
        "b AS (SELECT converted, " +
        "CASE WHEN recency <= 1 THEN 0 ELSE CAST(length(bin(recency)) - 1 AS BIGINT) END AS r_bucket, " +
        "CASE WHEN n_events <= 1 THEN 0 ELSE CAST(length(bin(n_events)) - 1 AS BIGINT) END AS f_bucket, " +
        "CASE WHEN cents <= 1 THEN 0 ELSE CAST(length(bin(cents)) - 1 AS BIGINT) END AS m_bucket " +
        "FROM r) " +
        "SELECT CAST(r_bucket AS BIGINT) AS r_bucket, " +
        "CAST(f_bucket AS BIGINT) AS f_bucket, " +
        "CAST(m_bucket AS BIGINT) AS m_bucket, " +
        "CAST(COUNT(*) AS BIGINT) AS n_users, " +
        "CAST(SUM(converted) AS BIGINT) AS n_converters, " +
        "CAST(SUM(converted) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) " +
        "AS conversion_rate FROM b GROUP BY 1, 2, 3 " +
        "ORDER BY r_bucket, f_bucket, m_bucket")

  /** One q338 power-iteration round: inflow fold, renormalization.
    * The normalizer is a window SUM over the SAME joined relation (not
    * a separate scalar CTE) so every round references its predecessor
    * exactly once — a second reference makes a non-materializing CTE
    * engine re-evaluate the whole chain per level (2^K blowup).
    */
  private def mkvRounds(k: Int): String =
    (1 to k).map(i =>
      s"ri$i AS (SELECT m.to_type AS t, SUM(p${i - 1}.p * m.pt) AS pin " +
        s"FROM p${i - 1} JOIN m ON p${i - 1}.t = m.from_type GROUP BY 1), " +
        s"p$i AS (SELECT ty.t, COALESCE(ri$i.pin, 0.0) / " +
        s"SUM(ri$i.pin) OVER () AS p FROM ty " +
        s"LEFT JOIN ri$i ON ty.t = ri$i.t)").mkString(", ")

  private def q328Sql: String =
    ("WITH b AS (SELECT event_type, " +
      "epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, " +
      "ts, event_id, value FROM events), " +
      "r AS (SELECT *, ROW_NUMBER() OVER " +
      "(PARTITION BY event_type, day ORDER BY ts, event_id) AS rna, " +
      "ROW_NUMBER() OVER (PARTITION BY event_type, day " +
      "ORDER BY ts DESC, event_id DESC) AS rnz FROM b) " +
      "SELECT event_type, CAST(day AS BIGINT) AS day, " +
      "CAST(COUNT(*) AS BIGINT) AS n_events, " +
      "MAX(CASE WHEN rna = 1 THEN value END) AS open, " +
      "MAX(value) AS high, MIN(value) AS low, " +
      "MAX(CASE WHEN rnz = 1 THEN value END) AS close, " +
      "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume " +
      "FROM r GROUP BY 1, 2 ORDER BY event_type, day")

  /** The q304 per-entity decile selection over the giniCtes chain. */
  private def lorenzSelect(entity: String, p: String): String =
    (s"SELECT '$entity' AS entity, CAST(d.decile AS BIGINT) AS decile, " +
      "CAST(d.r AS BIGINT) AS rank, " +
      "CAST(r0.cb + (d.r - r0.rbase) * CAST(r0.x AS HUGEINT) AS BIGINT) " +
      "AS cum_value, " +
      "CAST(r0.cb + (d.r - r0.rbase) * CAST(r0.x AS HUGEINT) AS DOUBLE) / " +
      "CAST(d.total AS DOUBLE) AS share " +
      "FROM (SELECT decile, (decile * n + 9) // 10 AS r, total " +
      "FROM (SELECT unnest(generate_series(1, 10)) AS decile) " +
      s"CROSS JOIN ${p}a) d " +
      s"JOIN ${p}r r0 ON d.r > r0.rbase AND d.r <= r0.rbase + r0.m")

  private def giniSelect(entity: String, p: String): String =
    (s"SELECT '$entity' AS entity, CAST(n AS BIGINT) AS n_keys, " +
      "CAST(total AS BIGINT) AS total, " +
      "CASE WHEN n * total = 0 THEN 0.0 ELSE " +
      "CAST(2 * sw - (n + 1) * total AS DOUBLE) / " +
      s"CAST(n * total AS DOUBLE) END AS gini FROM ${p}a")

  /** One FK edge of the q293 audit: child collapsed to (key, cnt),
    * left join against the distinct parent keys, NULL parent = orphan.
    */
  private def fkEdge(child: String, key: String,
      parent: String, pkey: String): String =
    (s"SELECT '$child.$key->$parent' AS relation, " +
      "CAST(SUM(cnt) AS BIGINT) AS n_rows, " +
      "CAST(COUNT(*) AS BIGINT) AS n_keys, " +
      "CAST(SUM(CASE WHEN orphan THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_keys, " +
      "CAST(SUM(CASE WHEN orphan THEN cnt ELSE 0 END) AS BIGINT) AS n_orphan_rows " +
      "FROM (SELECT ck.cnt, p.pk IS NULL AS orphan FROM " +
      s"(SELECT $key AS k, CAST(COUNT(*) AS BIGINT) AS cnt " +
      s"FROM $child GROUP BY 1) ck " +
      s"LEFT JOIN (SELECT DISTINCT $pkey AS pk FROM $parent) p " +
      "ON ck.k = p.pk)")

  /** One audited key of the q294 skew planner. */
  private def skewKey(table: String, key: String): String =
    (s"SELECT '$table.$key' AS key_name, " +
      "CAST(SUM(cnt) AS BIGINT) AS n_rows, " +
      "CAST(COUNT(*) AS BIGINT) AS n_keys, " +
      "CAST(MAX(cnt) AS BIGINT) AS max_mult, " +
      "CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_mult, " +
      "CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS max_share " +
      s"FROM (SELECT $key AS k, CAST(COUNT(*) AS BIGINT) AS cnt " +
      s"FROM $table GROUP BY 1)")

  private def q281Sql: String =
      ("WITH daily AS (SELECT event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), " +
        "d2 AS (SELECT *, (day + 4) % 7 AS dow FROM daily), " +
        "b AS (SELECT event_type, dow, " +
        "CAST(COUNT(*) AS BIGINT) AS n_days, " +
        "SUM(n) AS s, SUM(n * n) AS ss FROM d2 GROUP BY 1, 2), " +
        "j AS (SELECT d2.event_type, d2.day, d2.dow, d2.n, b.n_days, " +
        "CAST(b.s AS DOUBLE) / CAST(b.n_days AS DOUBLE) AS mean, " +
        "(CAST(b.ss AS DOUBLE) - CAST(b.s AS DOUBLE) * " +
        "CAST(b.s AS DOUBLE) / CAST(b.n_days AS DOUBLE)) / " +
        "CAST(b.n_days AS DOUBLE) AS variance " +
        "FROM d2 JOIN b ON d2.event_type = b.event_type " +
        "AND d2.dow = b.dow), " +
        "z AS (SELECT *, CASE WHEN variance <= 0 THEN 0.0 ELSE " +
        "(CAST(n AS DOUBLE) - mean) / sqrt(variance) END AS z FROM j) " +
        "SELECT event_type, CAST(day AS BIGINT) AS day, " +
        "CAST(dow AS BIGINT) AS dow, n, n_days, mean, z, " +
        "CAST(CASE WHEN abs(z) > 2 THEN 1 ELSE 0 END AS BIGINT) " +
        "AS is_anomaly FROM z ORDER BY event_type, day")

  private def q290Sql: String =
      ("WITH g AS (SELECT user_id, ts, event_id, " +
        "CASE WHEN LAG(ts) OVER w IS NULL OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS new_session FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM g), " +
        "se AS (SELECT user_id, session_id, MIN(ts) AS start_ts, " +
        "MAX(ts) AS end_ts FROM s GROUP BY 1, 2), " +
        "b AS (SELECT start_ts AS ts, 1 AS delta FROM se " +
        "UNION ALL SELECT end_ts AS ts, -1 AS delta FROM se), " +
        "r AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, delta, " +
        "SUM(delta) OVER (ORDER BY ts, delta DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM b) " +
        "SELECT CAST(day AS BIGINT) AS day, " +
        "CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts, " +
        "CAST(SUM(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ends, " +
        "CAST(MAX(run) AS BIGINT) AS max_concurrent " +
        "FROM r GROUP BY 1 ORDER BY day")

  private def q291Sql: String =
      (lifecycleUd +
        "sp AS (SELECT user_id, MIN(day) AS fd, MAX(day) AS ld " +
        "FROM ud GROUP BY 1), " +
        "mx AS (SELECT MAX(ld) AS m FROM sp), " +
        "t AS (SELECT ld - fd AS tenure, " +
        "CASE WHEN ld = (SELECT m FROM mx) THEN 1 ELSE 0 END AS censored " +
        "FROM sp), " +
        "b AS (SELECT tenure, CAST(COUNT(*) AS BIGINT) AS n_total, " +
        "CAST(SUM(censored) AS BIGINT) AS n_censored FROM t GROUP BY 1), " +
        "r AS (SELECT *, SUM(n_total) OVER (ORDER BY tenure DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at_risk " +
        "FROM b) " +
        "SELECT CAST(tenure AS BIGINT) AS tenure, " +
        "CAST(n_at_risk AS BIGINT) AS n_at_risk, " +
        "CAST(n_total - n_censored AS BIGINT) AS n_churned, n_censored, " +
        "CAST(n_total - n_censored AS DOUBLE) / CAST(n_at_risk AS DOUBLE) " +
        "AS hazard FROM r ORDER BY tenure")

  private def q292Sql: String =
      ("WITH daily AS (SELECT event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), " +
        "bounds AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily), " +
        "grid AS (SELECT t.event_type, g.day FROM " +
        "(SELECT DISTINCT event_type FROM daily) t CROSS JOIN " +
        "(SELECT unnest(generate_series(mn, mx)) AS day FROM bounds) g), " +
        "f AS (SELECT grid.event_type, grid.day, " +
        "COALESCE(daily.n, CAST(0 AS BIGINT)) AS n FROM grid " +
        "LEFT JOIN daily ON grid.event_type = daily.event_type " +
        "AND grid.day = daily.day), " +
        "tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS total, " +
        "CAST(COUNT(*) AS BIGINT) AS n_days FROM f GROUP BY 1), " +
        "y AS (SELECT f.event_type, f.day, f.n, t.n_days, t.total, " +
        "t.n_days * f.n - t.total AS yv FROM f JOIN tot t USING (event_type)), " +
        "p AS (SELECT *, SUM(yv) OVER (PARTITION BY event_type ORDER BY day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv FROM y), " +
        "sa AS (SELECT *, pv - LEAST(CAST(0 AS BIGINT), " +
        "MIN(pv) OVER (PARTITION BY event_type ORDER BY day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s FROM p) " +
        "SELECT event_type, CAST(day AS BIGINT) AS day, " +
        "CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS cusum_scaled, " +
        "CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE) AS cusum, " +
        "CAST(CASE WHEN s > 3 * total THEN 1 ELSE 0 END AS BIGINT) " +
        "AS is_shift FROM sa ORDER BY event_type, day")

  private def q273Sql: String =
      (lifecycleUd +
        "w AS (SELECT user_id, day, " +
        "LAG(day) OVER uw AS prev_day, LEAD(day) OVER uw AS next_day " +
        "FROM ud WINDOW uw AS (PARTITION BY user_id ORDER BY day)), " +
        "act AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_active, " +
        "CAST(SUM(CASE WHEN prev_day IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new, " +
        "CAST(SUM(CASE WHEN prev_day = day - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained, " +
        "CAST(SUM(CASE WHEN prev_day IS NOT NULL AND prev_day < day - 1 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected " +
        "FROM w GROUP BY 1), " +
        "ch AS (SELECT day + 1 AS day, CAST(COUNT(*) AS BIGINT) AS churn " +
        "FROM w WHERE next_day IS NULL OR next_day > day + 1 GROUP BY 1) " +
        "SELECT CAST(a.day AS BIGINT) AS day, n_active, n_new, " +
        "n_retained, n_resurrected, " +
        "CAST(COALESCE(ch.churn, 0) AS BIGINT) AS n_churned " +
        "FROM act a LEFT JOIN ch ON a.day = ch.day ORDER BY day")

  private def q275Sql: String =
      (lifecycleUd +
        "days AS (SELECT DISTINCT day FROM ud), " +
        "dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau " +
        "FROM ud GROUP BY 1), " +
        "wau AS (SELECT g.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) " +
        "AS wau FROM days g JOIN ud u " +
        "ON u.day BETWEEN g.day - 6 AND g.day GROUP BY 1) " +
        "SELECT CAST(d.day AS BIGINT) AS day, d.dau, w.wau, " +
        "CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness " +
        "FROM dau d JOIN wau w ON d.day = w.day ORDER BY day")

  private def q299Sql: String =
      ("WITH " + Seq(
        giniCtes("(SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x " +
          "FROM events GROUP BY 1)", "g1"),
        giniCtes("(SELECT user_id, " +
          "CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS x " +
          "FROM events GROUP BY 1)", "g2"),
        giniCtes("(SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS x " +
          "FROM orders GROUP BY 1)", "g3")).mkString(", ") + " " +
        Seq(giniSelect("events_per_user", "g1"),
          giniSelect("cents_per_user", "g2"),
          giniSelect("orders_per_customer", "g3"))
          .mkString(" UNION ALL ") + " ORDER BY entity")

  /** The shared lifecycle grain: distinct (user_id, exact epoch-day)
    * pairs — integer `//` division so both engines agree bit-for-bit.
    */
  private def lifecycleUd: String =
    ("WITH ud AS (SELECT DISTINCT user_id, " +
      "epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day " +
      "FROM events), ")

  private def q166Sql: String =
    ("WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d " +
      "FROM events), " +
      "f AS (SELECT user_id, MIN(d) AS cohort FROM a GROUP BY 1), " +
      "sz AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size " +
      "FROM f GROUP BY 1), " +
      "g AS (SELECT f.cohort, " +
      "CAST(date_diff('day', f.cohort, a.d) AS BIGINT) AS day_offset, " +
      "CAST(COUNT(*) AS BIGINT) AS n_active " +
      "FROM a JOIN f USING (user_id) GROUP BY 1, 2) " +
      "SELECT CAST(g.cohort AS VARCHAR) AS cohort, day_offset, " +
      "n_active, sz.cohort_size, " +
      "CAST(n_active AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE) " +
      "AS retention " +
      "FROM g JOIN sz USING (cohort) ORDER BY cohort, day_offset")

  private def q271Sql: String =
    ("WITH g AS (SELECT user_id, ts, event_id, " +
        "CASE WHEN LAG(ts) OVER w IS NULL OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS new_session FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM g), " +
        "z AS (SELECT user_id, session_id, " +
        "CAST(COUNT(*) AS BIGINT) AS n_events FROM s GROUP BY 1, 2), " +
        "b AS (SELECT CASE WHEN n_events <= 1 THEN 0 " +
        "ELSE CAST(length(bin(n_events)) - 1 AS BIGINT) END AS bucket, " +
        "n_events FROM z) " +
        "SELECT CAST(bucket AS BIGINT) AS bucket, " +
        "CAST(COUNT(*) AS BIGINT) AS n_sessions, " +
        "CAST(SUM(n_events) AS BIGINT) AS n_events, " +
        "MIN(n_events) AS min_events, MAX(n_events) AS max_events " +
        "FROM b GROUP BY 1 ORDER BY bucket")

  private def q278Sql: String =
    ("WITH g0 AS (SELECT user_id, ts, event_id, event_type, " +
        "CASE WHEN LAG(ts) OVER w IS NULL OR " +
        "ts > LAG(ts) OVER w + INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS new_session FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "g AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW) AS session_id FROM g0), " +
        "tv AS (SELECT user_id, session_id, MIN(event_id) AS tv, " +
        "MIN(ts) AS tv_ts FROM g WHERE event_type = 'view' " +
        "GROUP BY 1, 2), " +
        "tc AS (SELECT g.user_id, g.session_id, " +
        "MIN(g.event_id) AS tc, MIN(g.ts) AS tc_ts, " +
        "MIN(tv.tv_ts) AS tv_ts FROM g JOIN tv " +
        "ON g.user_id = tv.user_id AND g.session_id = tv.session_id " +
        "WHERE g.event_type = 'click' AND g.event_id > tv.tv " +
        "GROUP BY 1, 2), " +
        "tp AS (SELECT g.user_id, g.session_id, MIN(g.ts) AS tp_ts, " +
        "MIN(tc.tc_ts) AS tc_ts FROM g JOIN tc " +
        "ON g.user_id = tc.user_id AND g.session_id = tc.session_id " +
        "WHERE g.event_type = 'purchase' AND g.event_id > tc.tc " +
        "GROUP BY 1, 2), " +
        "lat AS (SELECT 't1_view_to_click' AS transition, " +
        "CAST(FLOOR((epoch_us(CAST(tc_ts AS TIMESTAMP)) - " +
        "epoch_us(CAST(tv_ts AS TIMESTAMP))) / 1000000.0) AS BIGINT) " +
        "AS gap_sec FROM tc UNION ALL " +
        "SELECT 't2_click_to_purchase' AS transition, " +
        "CAST(FLOOR((epoch_us(CAST(tp_ts AS TIMESTAMP)) - " +
        "epoch_us(CAST(tc_ts AS TIMESTAMP))) / 1000000.0) AS BIGINT) " +
        "AS gap_sec FROM tp), " +
        "h AS (SELECT transition, gap_sec, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM lat GROUP BY 1, 2), " +
        "cm AS (SELECT transition, gap_sec, cnt, " +
        "SUM(cnt) OVER (PARTITION BY transition ORDER BY gap_sec) AS cum, " +
        "SUM(cnt) OVER (PARTITION BY transition) AS n FROM h), " +
        "dd AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS decile) " +
        "SELECT transition, CAST(dd.decile AS BIGINT) AS decile, " +
        "gap_sec, CAST(n AS BIGINT) AS n_transitions " +
        "FROM cm CROSS JOIN dd " +
        "WHERE CAST(CEIL(CAST(dd.decile AS DOUBLE) * CAST(n AS DOUBLE) " +
        "/ 10.0) AS BIGINT) > cum - cnt " +
        "AND CAST(CEIL(CAST(dd.decile AS DOUBLE) * CAST(n AS DOUBLE) " +
        "/ 10.0) AS BIGINT) <= cum " +
        "ORDER BY transition, decile")

  private def q280Sql: String =
    ("WITH udc AS (SELECT user_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) " +
        "AS cents FROM events GROUP BY 1, 2), " +
        "c AS (SELECT *, MIN(day) OVER (PARTITION BY user_id) " +
        "AS cohort_day FROM udc), " +
        "a AS (SELECT cohort_day, day - cohort_day AS age, " +
        "CAST(COUNT(*) AS BIGINT) AS n_users, " +
        "CAST(SUM(cents) AS BIGINT) AS cents FROM c GROUP BY 1, 2) " +
        "SELECT CAST(cohort_day AS BIGINT) AS cohort_day, " +
        "CAST(age AS BIGINT) AS age, n_users, cents, " +
        "CAST(FIRST_VALUE(n_users) OVER cw AS BIGINT) AS cohort_size, " +
        "CAST(SUM(cents) OVER (PARTITION BY cohort_day ORDER BY age " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
        "AS cum_cents, " +
        "CAST(SUM(cents) OVER (PARTITION BY cohort_day ORDER BY age " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / " +
        "CAST(FIRST_VALUE(n_users) OVER cw AS DOUBLE) " +
        "AS ltv_cents_per_user " +
        "FROM a WINDOW cw AS (PARTITION BY cohort_day ORDER BY age) " +
        "ORDER BY cohort_day, age")

  private def q144Sql: String =
    ("WITH g0 AS (SELECT user_id, ts, event_id, event_type, " +
        "CASE WHEN LAG(ts) OVER w IS NULL OR " +
        "ts > LAG(ts) OVER w + INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS new_session FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "g AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW) AS session_id FROM g0), " +
        "tv AS (SELECT user_id, session_id, MIN(event_id) AS tv " +
        "FROM g WHERE event_type = 'view' GROUP BY 1, 2), " +
        "tc AS (SELECT g.user_id, g.session_id, " +
        "MIN(g.event_id) AS tc FROM g JOIN tv " +
        "ON g.user_id = tv.user_id AND g.session_id = tv.session_id " +
        "WHERE g.event_type = 'click' AND g.event_id > tv.tv " +
        "GROUP BY 1, 2), " +
        "tp AS (SELECT g.user_id, g.session_id, " +
        "MIN(g.event_id) AS tp FROM g JOIN tc " +
        "ON g.user_id = tc.user_id AND g.session_id = tc.session_id " +
        "WHERE g.event_type = 'purchase' AND g.event_id > tc.tc " +
        "GROUP BY 1, 2) " +
        "SELECT stage, n_sessions FROM (" +
        "SELECT 's0_sessions' AS stage, CAST(COUNT(*) AS BIGINT) " +
        "AS n_sessions FROM " +
        "(SELECT DISTINCT user_id, session_id FROM g) " +
        "UNION ALL SELECT 's1_view', CAST(COUNT(*) AS BIGINT) FROM tv " +
        "UNION ALL SELECT 's2_view_click', CAST(COUNT(*) AS BIGINT) " +
        "FROM tc " +
        "UNION ALL SELECT 's3_view_click_purchase', " +
        "CAST(COUNT(*) AS BIGINT) FROM tp) ORDER BY stage")

  private def q274Sql: String =
    ("WITH pu AS (SELECT user_id, " +
        "MAX(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS last_day, " +
        "CAST(COUNT(*) AS BIGINT) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents " +
        "FROM events GROUP BY 1), " +
        "r AS (SELECT *, (SELECT MAX(last_day) FROM pu) - last_day " +
        "AS recency FROM pu), " +
        "b AS (SELECT n_events, cents, recency, " +
        "CASE WHEN recency <= 1 THEN 0 ELSE CAST(length(bin(recency)) - 1 AS BIGINT) END AS r_bucket, " +
        "CASE WHEN n_events <= 1 THEN 0 ELSE CAST(length(bin(n_events)) - 1 AS BIGINT) END AS f_bucket, " +
        "CASE WHEN cents <= 1 THEN 0 ELSE CAST(length(bin(cents)) - 1 AS BIGINT) END AS m_bucket " +
        "FROM r) " +
        "SELECT CAST(r_bucket AS BIGINT) AS r_bucket, " +
        "CAST(f_bucket AS BIGINT) AS f_bucket, " +
        "CAST(m_bucket AS BIGINT) AS m_bucket, " +
        "CAST(COUNT(*) AS BIGINT) AS n_users, " +
        "CAST(SUM(n_events) AS BIGINT) AS n_events, " +
        "CAST(SUM(cents) AS BIGINT) AS sum_cents, " +
        "MIN(recency) AS min_recency, MAX(recency) AS max_recency " +
        "FROM b GROUP BY 1, 2, 3 ORDER BY r_bucket, f_bucket, m_bucket")

  private def q201Sql: String =
    ("WITH c AS (SELECT user_id, ts, event_id, event_type, " +
      "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) " +
      "AS prev FROM events), " +
      "ch AS (SELECT * FROM c WHERE prev IS NULL OR prev <> event_type), " +
      "v AS (SELECT user_id, event_type, ts, " +
      "CAST(ROW_NUMBER() OVER w AS BIGINT) AS version, " +
      "LEAD(ts) OVER w AS valid_to_ts FROM ch " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
      "SELECT user_id, version, event_type AS attr, " +
      "strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from, " +
      "strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S') AS valid_to, " +
      "CAST(CASE WHEN valid_to_ts IS NULL THEN 1 ELSE 0 END AS BIGINT) " +
      "AS is_current FROM v ORDER BY user_id, version")

  private def q214Sql: String =
    ("WITH w AS (SELECT user_id, ts, event_id, event_type, value, " +
      "MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (" +
      "PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) " +
      "AS last_click_ts FROM events), " +
      "p AS (SELECT CAST(ts AS DATE) AS day, " +
      "CASE WHEN last_click_ts IS NOT NULL AND " +
      "ts <= last_click_ts + INTERVAL 1 HOUR THEN 1 ELSE 0 END AS att, " +
      "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents " +
      "FROM w WHERE event_type = 'purchase') " +
      "SELECT CAST(day AS VARCHAR) AS day, " +
      "CAST(COUNT(*) AS BIGINT) AS n_purchases, " +
      "CAST(SUM(att) AS BIGINT) AS n_attributed, " +
      "CAST(SUM(att) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) " +
      "AS attribution_rate, " +
      "CAST(SUM(CASE WHEN att = 1 THEN cents ELSE 0 END) AS BIGINT) " +
      "AS attributed_cents " +
      "FROM p GROUP BY day ORDER BY day")

  private def q208Sql: String =
    ("WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, " +
      "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), " +
      "l AS (SELECT *, " +
      (1 to 8).map(j => s"LAG(n, $j) OVER win AS l$j")
        .mkString(", ") + " FROM daily " +
      "WINDOW win AS (PARTITION BY event_type ORDER BY day)), " +
      "c AS (SELECT event_type, day, n, " +
      (1 to 8).map { j =>
        val wj = BigInt(3).pow(j - 1).toLong * BigInt(4).pow(8 - j).toLong
        s"COALESCE(l$j * $wj, 0)"
      }.mkString(" + ") + " AS num, " +
      (1 to 8).map { j =>
        val wj = BigInt(3).pow(j - 1).toLong * BigInt(4).pow(8 - j).toLong
        s"(CASE WHEN l$j IS NULL THEN 0 ELSE $wj END)"
      }.mkString(" + ") + " AS den FROM l) " +
      "SELECT event_type, CAST(day AS VARCHAR) AS day, n, " +
      "CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS ewma, " +
      "CAST(n * den AS DOUBLE) / CAST(num AS DOUBLE) AS ratio, " +
      "CAST(CASE WHEN n * den > 2 * num THEN 1 ELSE 0 END AS BIGINT) " +
      "AS spike FROM c WHERE den > 0 ORDER BY event_type, day")

  /** q257/q261: one lag per (user, type), exact micro gap compare. */
  private def q198Sql: String =
    ("WITH g AS (SELECT user_id, ts, event_id, event_type, " +
      "CASE WHEN LAG(ts) OVER w IS NULL OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE " +
      "THEN 1 ELSE 0 END AS new_session FROM events " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
      "s AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM g), " +
      "tr AS (SELECT LAG(event_type) OVER " +
      "(PARTITION BY user_id, session_id ORDER BY ts, event_id) " +
      "AS from_type, event_type AS to_type FROM s), " +
      "c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n " +
      "FROM tr WHERE from_type IS NOT NULL GROUP BY 1, 2) " +
      "SELECT from_type, to_type, n, " +
      "CAST(n AS DOUBLE) / CAST(SUM(n) OVER " +
      "(PARTITION BY from_type) AS DOUBLE) AS p " +
      "FROM c ORDER BY from_type, to_type")

  // q260: log2 histogram of same-(user, type) inter-event gaps —
  // the distribution that sizes the debounce gap / session timeout /
  // watermark delay; exact integer log2 via the bit-length identity
  private def q260Sql: String =
    ("WITH g AS (SELECT user_id, event_type, ts, " +
      "LAG(ts) OVER (PARTITION BY user_id, event_type " +
      "ORDER BY ts, event_id) AS prev FROM events), " +
      "d AS (SELECT event_type, " +
      "CAST(FLOOR((epoch_us(CAST(ts AS TIMESTAMP)) - " +
      "epoch_us(CAST(prev AS TIMESTAMP))) / 1000000.0) AS BIGINT) " +
      "AS gap_sec FROM g WHERE prev IS NOT NULL), " +
      "b AS (SELECT event_type, CASE WHEN gap_sec <= 1 THEN 0 " +
      "ELSE CAST(length(bin(gap_sec)) - 1 AS BIGINT) END AS bucket, " +
      "gap_sec FROM d) " +
      "SELECT event_type, CAST(bucket AS BIGINT) AS bucket, " +
      "CAST(COUNT(*) AS BIGINT) AS n_gaps, " +
      "MIN(gap_sec) AS min_gap_sec, MAX(gap_sec) AS max_gap_sec, " +
      "CAST(SUM(gap_sec) AS BIGINT) AS sum_gap_sec " +
      "FROM b GROUP BY 1, 2 ORDER BY event_type, bucket")

  private def q257Sql: String =
    ("WITH g AS (SELECT user_id, event_type, ts, " +
      "LAG(ts) OVER (PARTITION BY user_id, event_type " +
      "ORDER BY ts, event_id) AS prev FROM events), " +
      "f AS (SELECT event_type, CASE WHEN prev IS NOT NULL AND " +
      "epoch_us(CAST(ts AS TIMESTAMP)) - " +
      "epoch_us(CAST(prev AS TIMESTAMP)) <= 3600000000 " +
      "THEN 1 ELSE 0 END AS sup FROM g) " +
      "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events, " +
      "CAST(SUM(sup) AS BIGINT) AS n_suppressed, " +
      "CAST(COUNT(*) - SUM(sup) AS BIGINT) AS n_kept, " +
      "CAST(COUNT(*) - SUM(sup) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) " +
      "AS kept_rate FROM f GROUP BY event_type ORDER BY event_type")

  /** q259: the q222 register construction keyed by day over
    * md5(user_id), cumulative max-merge across days, q222's exact
    * BIGINT harmonic sums and estimator; exact curve via first-seen
    * prefix sum.
    */
  private def q259Sql: String = {
    val nib = (i: Int) =>
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1)"
    val vExpr = (3 to 14).zipWithIndex.map { case (i, j) =>
      val w = BigInt(16).pow(11 - j)
      if (w == BigInt(1)) nib(i) else s"${nib(i)} * $w"
    }.mkString(" + ")
    ("WITH ev AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events), " +
      "dd AS (SELECT DISTINCT day FROM ev), " +
      "hh AS (SELECT day, md5(CAST(user_id AS VARCHAR)) AS h FROM ev), " +
      s"x AS (SELECT day, ${nib(1)} * 16 + ${nib(2)} AS reg, " +
      s"$vExpr AS v FROM hh), " +
      "r AS (SELECT day, reg, MAX(CASE WHEN v = 0 THEN 49 " +
      "ELSE 49 - length(bin(v)) END) AS mrho FROM x GROUP BY 1, 2), " +
      "cum AS (SELECT dd.day AS as_of, r.reg, MAX(r.mrho) AS mrho " +
      "FROM dd JOIN r ON r.day <= dd.day GROUP BY 1, 2), " +
      "p AS (SELECT as_of, CAST(COUNT(*) AS BIGINT) AS registers_hit, " +
      "CAST(SUM(CAST(pow(2.0, 49 - mrho) AS BIGINT)) AS BIGINT) " +
      "AS s_hit FROM cum GROUP BY 1), " +
      "q AS (SELECT as_of, registers_hit, " +
      "CAST(s_hit + (256 - registers_hit) * 562949953421312 AS BIGINT) " +
      "AS s_scaled, 256 - registers_hit AS v0 FROM p), " +
      "q2 AS (SELECT *, (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * " +
      "562949953421312.0 / CAST(s_scaled AS DOUBLE) AS raw_estimate " +
      "FROM q), " +
      "q3 AS (SELECT as_of, registers_hit, s_scaled, raw_estimate, " +
      "CASE WHEN v0 > 0 AND raw_estimate <= 640.0 " +
      "THEN 256.0 * ln(256.0 / CAST(v0 AS DOUBLE)) " +
      "ELSE raw_estimate END AS estimate FROM q2), " +
      "fs AS (SELECT user_id, MIN(day) AS first_day FROM ev GROUP BY 1), " +
      "nn AS (SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) " +
      "AS n_new FROM fs GROUP BY 1), " +
      "e AS (SELECT dd.day, COALESCE(nn.n_new, 0) AS n_new, " +
      "CAST(SUM(COALESCE(nn.n_new, 0)) OVER (ORDER BY dd.day " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
      "AS exact_cum FROM dd LEFT JOIN nn USING (day)) " +
      "SELECT CAST(e.day AS VARCHAR) AS day, " +
      "CAST(e.n_new AS BIGINT) AS n_new, e.exact_cum, " +
      "q3.registers_hit, q3.s_scaled, q3.raw_estimate, q3.estimate, " +
      "(q3.estimate - CAST(e.exact_cum AS DOUBLE)) / " +
      "CAST(e.exact_cum AS DOUBLE) AS rel_err " +
      "FROM e JOIN q3 ON q3.as_of = e.day ORDER BY day")
  }
}
