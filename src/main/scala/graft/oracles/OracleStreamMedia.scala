package graft.oracles

/** DuckDB oracle SQL — Structured Streaming and multimodal/media queries.
  *
  * Split out of `graft.Registry` (which had grown past 1,900 lines);
  * `Registry.oracleSql` merges the per-family maps and asserts key
  * disjointness. Entry text is unchanged — column aliases and total-
  * order sorts still mirror the Spark queries exactly.
  */
private[graft] object OracleStreamMedia {
  val sql: Map[String, String] = Map(
    "q36_streaming_window" ->
      ("SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start, event_type, " +
        "COUNT(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    "q37_stateful_totals" ->
      ("SELECT user_id, COUNT(*) AS n_events, " +
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    "q38_binary_meta" ->
      ("SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'image' " +
        "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type, " +
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        "md5(text) AS content_hash, " +
        "lower(hex(encode(substring(text, 1, 8)))) AS head_bytes " +
        "FROM documents ORDER BY doc_id"),
    // text is ASCII in the fixtures (asserted by Wave3Spec), so
    // ascii(substring(...)) IS the payload byte; each frame mean is
    // an exact integer sum over <= 32 bytes with one closing IEEE
    // division — bit-identical cross-engine
    "q39_frame_features" ->
      ("WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents), " +
        "pos AS (SELECT doc_id, text, unnest(range(0, n)) AS p FROM d), " +
        "b AS (SELECT doc_id, CAST(p // 32 AS INT) AS frame_idx, " +
        "ascii(substring(text, CAST(p + 1 AS INT), 1)) AS v FROM pos) " +
        "SELECT doc_id, frame_idx, " +
        "CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_intensity " +
        "FROM b GROUP BY 1, 2 ORDER BY 1, 2"),
    // the streaming interval join must converge to the batch answer —
    // same oracle as q72
    "q74_stream_stream_join" ->
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
    "q76_stream_static_join" ->
      ("SELECT c_mktsegment, COUNT(*) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM events LEFT JOIN customer ON user_id = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST"),
    "q77_streaming_dedup" ->
      ("SELECT DISTINCT user_id, event_type FROM events " +
        "ORDER BY user_id, event_type"),
    // identical to q20's oracle: the streaming sessionizer must converge
    // to the batch result once its open sessions flush at end-of-stream
    "q89_stream_sessions" ->
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
    "q90_user_activity_tws" ->
      ("SELECT user_id, COUNT(*) AS n_events, " +
        "COUNT(DISTINCT event_type) AS n_types, " +
        "MAX(event_id) AS max_event_id " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    // whole-frame truncation makes every frame mean dyadic (s/32), so
    // bucket sums are exact and the final division deterministic
    "q122_media_oracled" ->
      ("WITH d AS (SELECT doc_id, text, " +
        "length(text) - length(text) % 32 AS n FROM documents), " +
        "pos AS (SELECT doc_id, text, unnest(range(0, n)) AS p FROM d), " +
        "f AS (SELECT doc_id, p // 32 AS idx, " +
        "SUM(ascii(substring(text, CAST(p + 1 AS INT), 1))) AS s " +
        "FROM pos GROUP BY 1, 2), " +
        "sm AS (SELECT doc_id, idx // 4 AS i, CAST(s AS DOUBLE) / 32 AS mean " +
        "FROM f WHERE idx % 4 = 0), " +
        "m AS (SELECT doc_id, COUNT(*) AS mm FROM sm GROUP BY 1), " +
        "r AS (SELECT sm.doc_id, " +
        "CAST(least(sm.i * 8 // m.mm, 7) AS INT) AS bucket, sm.mean " +
        "FROM sm JOIN m ON sm.doc_id = m.doc_id) " +
        "SELECT doc_id, bucket, SUM(mean) / COUNT(*) AS feat " +
        "FROM r GROUP BY 1, 2 ORDER BY 1, 2"),
    // q95's md5 min-hash chain with the q116 corpus/batch split: new
    // docs (doc_id%10=9) band-join the historical side AND each other
    // (stream-vs-stream pairs canonically oriented new_id = max id, so
    // the set is micro-batch-split-invariant), then exact-Jaccard
    // verification — the streaming foreachBatch result drained over
    // the same fixture must hash-match this exactly
    "q145_streaming_band_oracled" ->
      ("WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '') AS toks FROM documents), " +
        "s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS sh FROM t), " +
        "f AS (SELECT * FROM s WHERE len(sh) > 0), " +
        "e AS (SELECT doc_id, unnest(sh) AS g FROM f), " +
        "sig AS (SELECT doc_id, " +
        "MIN(md5(g || '#0')) AS m0, MIN(md5(g || '#1')) AS m1, " +
        "MIN(md5(g || '#2')) AS m2, MIN(md5(g || '#3')) AS m3, " +
        "MIN(md5(g || '#4')) AS m4, MIN(md5(g || '#5')) AS m5, " +
        "MIN(md5(g || '#6')) AS m6, MIN(md5(g || '#7')) AS m7 " +
        "FROM e GROUP BY doc_id), " +
        "band AS (SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bucket FROM sig " +
        "UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM sig " +
        "UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM sig " +
        "UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM sig), " +
        "p AS (SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id " +
        "FROM band n JOIN band c ON n.band = c.band AND n.bucket = c.bucket " +
        "WHERE n.doc_id % 10 = 9 " +
        "AND (c.doc_id % 10 <> 9 OR n.doc_id > c.doc_id)), " +
        "v AS (SELECT new_id, corpus_id, len(list_intersect(a.sh, b.sh)) AS inter, " +
        "len(a.sh) AS la, len(b.sh) AS lb " +
        "FROM p JOIN f a ON a.doc_id = p.new_id JOIN f b ON b.doc_id = p.corpus_id) " +
        "SELECT new_id, corpus_id, " +
        "CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) AS jaccard FROM v " +
        "WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) >= 0.5 " +
        "ORDER BY new_id, corpus_id"),
    // q39's production shape: per-doc frame byte-sums (exact integers,
    // ragged tail included), comma-serialized in frame order
    "q146_frame_features_agg" -> q146Sql,
    // q233 (the streaming decode-on-arrival twin) shares this SQL
    // verbatim: docs stream exactly once, so the drained feature
    // state equals the batch relation for any micro-batch split
    "q233_streaming_frame_features" -> q146Sql,
    // the drained stream must equal the full-corpus batch vocab
    "q128_streaming_vocab" ->
      ("WITH t AS (SELECT doc_id, " +
        "unnest(list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '')) AS token FROM documents) " +
        "SELECT token, CAST(COUNT(*) AS BIGINT) AS tf, " +
        "CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df " +
        "FROM t GROUP BY token ORDER BY token"),
    // q149: the q120 md5-nibble centroid model and dot-argmax `a` CTE,
    // restricted to the streamed side (vec_id % 10 = 9), score kept —
    // the drained foreachBatch assignments must hash-match exactly
    "q149_streaming_ivf_assign" ->
      ("WITH cv AS (SELECT c, d, " +
        "CAST(strpos('0123456789abcdef', substr(md5('iv|' || " +
        "CAST(c AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 1)) - 9 " +
        "AS DOUBLE) / 16.0 AS val " +
        "FROM range(0, 4) t1(c), range(0, 64) t2(d)), " +
        "cent AS (SELECT c, list(val ORDER BY d) AS w FROM cv GROUP BY c), " +
        "v AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
        "FROM embeddings WHERE vec_id % 10 = 9), " +
        "s AS (SELECT vec_id, c, " +
        "list_reduce(list_transform(list_zip(v, w), pr -> pr[1] * pr[2]), " +
        "(acc, y) -> acc + y) AS s FROM v CROSS JOIN cent) " +
        "SELECT vec_id, CAST(c AS BIGINT) AS cid, s AS score " +
        "FROM (SELECT vec_id, c, s, ROW_NUMBER() OVER " +
        "(PARTITION BY vec_id ORDER BY s DESC, c) AS rn FROM s) " +
        "WHERE rn = 1 ORDER BY vec_id"),
    // q163: q146's exact frame sums as the shingle set, then the q95
    // md5 sig/band/verify chain — media near-dup, fully cross-engine
    "q163_media_neardup" ->
      ("WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents " +
        "WHERE length(text) > 0), " +
        "pos AS (SELECT doc_id, text, unnest(range(0, n)) AS p FROM d), " +
        "fr AS (SELECT doc_id, p // 32 AS idx, " +
        "SUM(ascii(substring(text, CAST(p + 1 AS INT), 1))) AS s " +
        "FROM pos GROUP BY 1, 2), " +
        "f AS (SELECT doc_id, list_distinct(list(CAST(s AS VARCHAR))) " +
        "AS sh FROM fr GROUP BY doc_id), " +
        "e AS (SELECT doc_id, unnest(sh) AS g FROM f), " +
        "sig AS (SELECT doc_id, " +
        "MIN(md5(g || '#0')) AS m0, MIN(md5(g || '#1')) AS m1, " +
        "MIN(md5(g || '#2')) AS m2, MIN(md5(g || '#3')) AS m3, " +
        "MIN(md5(g || '#4')) AS m4, MIN(md5(g || '#5')) AS m5, " +
        "MIN(md5(g || '#6')) AS m6, MIN(md5(g || '#7')) AS m7 " +
        "FROM e GROUP BY doc_id), " +
        "band AS (SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bucket FROM sig " +
        "UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM sig " +
        "UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM sig " +
        "UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM sig), " +
        "p AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b " +
        "FROM band l JOIN band r ON l.band = r.band AND l.bucket = r.bucket " +
        "WHERE l.doc_id < r.doc_id), " +
        "v AS (SELECT id_a, id_b, len(list_intersect(a.sh, b.sh)) AS inter, " +
        "len(a.sh) AS la, len(b.sh) AS lb " +
        "FROM p JOIN f a ON a.doc_id = p.id_a JOIN f b ON b.doc_id = p.id_b) " +
        "SELECT id_a, id_b, " +
        "CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) AS jaccard FROM v " +
        "WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) >= 0.5 " +
        "ORDER BY id_a, id_b"),
    // q182: streaming quality gate — the drained per-source (seen,
    // passed) ledger equals this batch aggregate for ANY micro-batch
    // split (the merge is a commutative sum); the flag is q24's
    // composite rule verbatim
    "q182_streaming_quality_gate" ->
      ("WITH t AS (SELECT source, list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '') AS toks " +
        "FROM documents), " +
        "fl AS (SELECT source, CAST(len(toks) >= 20 AND " +
        "CAST(len(list_distinct(toks)) AS DOUBLE) / " +
        "CAST(len(toks) AS DOUBLE) > 0.1 AND " +
        "CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS DOUBLE) / " +
        "CAST(len(toks) AS DOUBLE) < 0.5 AS BIGINT) AS flag FROM t) " +
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_seen, " +
        "CAST(SUM(flag) AS BIGINT) AS n_pass, " +
        "CAST(SUM(flag) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) " +
        "AS accept_rate " +
        "FROM fl GROUP BY source ORDER BY source"),
    // q213: with capacity ≥ distinct users no eviction fires, so the
    // drained SpaceSaving summary is the exact count table — err = 0
    // is part of the oracle (the capacity contract made visible)
    "q213_streaming_heavy_hitters" ->
      ("WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events " +
        "FROM events GROUP BY user_id), " +
        "r AS (SELECT user_id, n_events, CAST(ROW_NUMBER() OVER (" +
        "ORDER BY n_events DESC, user_id) AS BIGINT) AS rank FROM c) " +
        "SELECT rank, user_id, n_events, CAST(0 AS BIGINT) AS err " +
        "FROM r WHERE rank <= 20 ORDER BY rank"),
  )

  private def q146Sql: String =
    ("WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents " +
      "WHERE length(text) > 0), " +
      "pos AS (SELECT doc_id, text, unnest(range(0, n)) AS p FROM d), " +
      "f AS (SELECT doc_id, p // 32 AS idx, " +
      "SUM(ascii(substring(text, CAST(p + 1 AS INT), 1))) AS s " +
      "FROM pos GROUP BY 1, 2) " +
      "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames, " +
      "string_agg(s, ',' ORDER BY idx) AS frame_sums " +
      "FROM f GROUP BY doc_id ORDER BY doc_id")
}
