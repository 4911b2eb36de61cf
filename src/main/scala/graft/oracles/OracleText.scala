package graft.oracles

/** DuckDB oracle SQL — text analysis, IR, LM and tokenizer-training queries.
  *
  * Split out of `graft.Registry` (which had grown past 1,900 lines);
  * `Registry.oracleSql` merges the per-family maps and asserts key
  * disjointness. Entry text is unchanged — column aliases and total-
  * order sorts still mirror the Spark queries exactly.
  */
private[graft] object OracleText {

  /** BPE oracle round builder (q131): from symbol table `prev`
    * (w, freq, pos, sym) derive `b$r` (the argmax pair) and `s$r`
    * (the rewritten symbol table). Leftmost non-overlapping merge
    * application via gaps-and-islands + odd run-parity — the same
    * relational spelling as [[TextOps.bpeMerges]], so every
    * intermediate hash-matches.
    */
  /** q244 / q350: the q131 trainer run TWICE (snapshot = doc_id % 10
    * <> 9 vs full corpus), merge tables diffed rank by rank —
    * prefixed CTE chains keep the two trainings independent inside
    * one query. Shared verbatim by the batch drift check and its
    * streaming twin off the maintained (w, split) word state.
    */
  private def q244DriftSql: String =
    "WITH swords AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq " +
      "FROM (SELECT unnest(list_filter(string_split_regex(text, " +
      "'\\s+'), x -> x <> '')) AS w FROM documents " +
      "WHERE doc_id % 10 <> 9) GROUP BY w), " +
      "ss0 AS (SELECT w, freq, CAST(u.p AS BIGINT) AS pos, " +
      "substr(w, CAST(u.p + 1 AS INT), 1) AS sym " +
      "FROM swords, unnest(range(len(w))) u(p)), " +
      bpeRound("ss0", 1, "s") + ", " +
      bpeRound("ss1", 2, "s") + ", " +
      bpeRound("ss2", 3, "s") + ", " +
      "fwords AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq " +
      "FROM (SELECT unnest(list_filter(string_split_regex(text, " +
      "'\\s+'), x -> x <> '')) AS w FROM documents) GROUP BY w), " +
      "fs0 AS (SELECT w, freq, CAST(u.p AS BIGINT) AS pos, " +
      "substr(w, CAST(u.p + 1 AS INT), 1) AS sym " +
      "FROM fwords, unnest(range(len(w))) u(p)), " +
      bpeRound("fs0", 1, "f") + ", " +
      bpeRound("fs1", 2, "f") + ", " +
      bpeRound("fs2", 3, "f") + " " +
      "SELECT r, snap_a, snap_b, snap_cnt, full_a, full_b, full_cnt, " +
      "CAST(CASE WHEN snap_a = full_a AND snap_b = full_b THEN 1 " +
      "ELSE 0 END AS BIGINT) AS same_merge FROM (" +
      (1 to 3).map(r =>
        s"SELECT CAST($r AS BIGINT) AS r, sb.a AS snap_a, " +
          s"sb.b AS snap_b, sb.cnt AS snap_cnt, fb.a AS full_a, " +
          s"fb.b AS full_b, fb.cnt AS full_cnt " +
          s"FROM sb$r sb CROSS JOIN fb$r fb").mkString(" UNION ALL ") +
      ") ORDER BY r"

  /** q351 / q352: batch word-3-gram types absent from the snapshot,
    * with frequencies and the novelty mass/rate audit columns.
    * GRAM grain — word-level OOV is vacuous on the fixture (0 rows).
    */
  private def oovSql: String =
    "WITH oovtk AS (SELECT doc_id % 10 = 9 AS is_batch, " +
      "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
      "AS toks FROM documents), " +
      "oovt AS (SELECT is_batch, " +
      "unnest(list_transform(range(1, len(toks) - 1), " +
      "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) " +
      "AS w FROM oovtk), " +
      "oovb AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq " +
      "FROM oovt WHERE is_batch GROUP BY w), " +
      "oovs AS (SELECT DISTINCT w FROM oovt WHERE NOT is_batch), " +
      "oovn AS (SELECT b.w, b.freq FROM oovb b " +
      "LEFT JOIN oovs s ON b.w = s.w WHERE s.w IS NULL), " +
      "oovtot AS (SELECT CAST(COALESCE(SUM(freq), 0) AS BIGINT) " +
      "AS n_batch_tokens FROM oovb), " +
      "oovm AS (SELECT CAST(COALESCE(SUM(freq), 0) AS BIGINT) " +
      "AS oov_tokens FROM oovn) " +
      "SELECT n.w, n.freq, t.n_batch_tokens, m.oov_tokens, " +
      "CAST(m.oov_tokens AS DOUBLE) / CAST(t.n_batch_tokens AS DOUBLE) " +
      "AS oov_rate FROM oovn n CROSS JOIN oovtot t CROSS JOIN oovm m " +
      "ORDER BY n.freq DESC, n.w"

  private def bpeRound(prev: String, r: Int, p: String = ""): String =
    s"${p}n$r AS (SELECT w, freq, pos, sym, " +
      "LEAD(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt " +
      s"FROM $prev), " +
      s"${p}b$r AS (SELECT sym AS a, nxt AS b, " +
      s"CAST(SUM(freq) AS BIGINT) AS cnt FROM ${p}n$r " +
      "WHERE nxt IS NOT NULL GROUP BY sym, nxt " +
      "ORDER BY cnt DESC, a ASC, b ASC LIMIT 1), " +
      s"${p}i$r AS (SELECT *, (nxt IS NOT NULL AND " +
      s"sym = (SELECT a FROM ${p}b$r) AND nxt = (SELECT b FROM ${p}b$r)) " +
      s"AS ispair FROM ${p}n$r), " +
      s"${p}r$r AS (SELECT *, CASE WHEN ispair THEN pos - " +
      "ROW_NUMBER() OVER (PARTITION BY w, ispair ORDER BY pos) END " +
      s"AS runid FROM ${p}i$r), " +
      s"${p}e$r AS (SELECT *, ispair AND " +
      "(ROW_NUMBER() OVER (PARTITION BY w, runid ORDER BY pos) % 2 = 1) " +
      s"AS sel FROM ${p}r$r), " +
      s"${p}g$r AS (SELECT *, COALESCE(" +
      "LAG(sel) OVER (PARTITION BY w ORDER BY pos), false) " +
      s"AS prevsel FROM ${p}e$r), " +
      s"${p}s$r AS (SELECT w, freq, " +
      "ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos) - 1 AS pos, " +
      "CASE WHEN sel THEN sym || nxt ELSE sym END AS sym " +
      s"FROM ${p}g$r WHERE NOT prevsel)"

  private val sql1: Map[String, String] = Map(
    "q22_extract_multivalue" ->
      ("WITH e AS (SELECT c_custkey, " +
        "list_filter(list_transform(string_split_regex(replace(" +
        "c_name || ';' || c_mktsegment || ';' || c_name || ' / ' || c_mktsegment, " +
        "' ', ''), '[,;/]+'), x -> trim(x)), x -> x <> '') AS vals FROM customer) " +
        "SELECT c_custkey, array_to_string(vals, ',') AS extracted, " +
        "CAST(len(vals) AS BIGINT) AS n_values FROM e ORDER BY c_custkey"),
    "q23_merge_multivalue" ->
      ("WITH base AS (SELECT c_custkey, " +
        "list_filter(list_transform(string_split(c_name, '#'), x -> trim(x)), " +
        "x -> x IS NOT NULL AND x <> '') || " +
        "list_filter(list_transform(string_split_regex(replace(" +
        "c_mktsegment || ',' || c_name || ',' || c_mktsegment, ' ', ''), '[,;/]+'), " +
        "x -> trim(x)), x -> x <> '') AS allv FROM customer), " +
        "m AS (SELECT c_custkey, list_filter(allv, (x, i) -> list_position(allv, x) = i) " +
        "AS merged FROM base) " +
        "SELECT c_custkey, array_to_string(merged[1:10], '|') AS slots, " +
        "COALESCE(array_to_string(merged[11:], ','), '') AS overflow " +
        "FROM m ORDER BY c_custkey"),
    "q24_doc_quality" ->
      ("WITH t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks, " +
        "CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_subwords " +
        "FROM documents) " +
        "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, n_subwords, " +
        "CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS avg_token_len, " +
        "CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS stopword_ratio, " +
        "CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS distinct_ratio, " +
        "CAST(len(toks) >= 20 AND " +
        "CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) > 0.1 AND " +
        "CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS DOUBLE) / CAST(len(toks) AS DOUBLE) < 0.5 " +
        "AS BIGINT) AS quality_flag FROM t ORDER BY doc_id"),
    "q25_lang_id" ->
      ("WITH t AS (SELECT doc_id, lang, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks FROM documents) " +
        "SELECT doc_id, lang, CASE " +
        "WHEN len(list_filter(toks, x -> x = 'the')) >= 3 THEN 'en' " +
        "WHEN len(list_filter(toks, x -> x = 'data')) >= 3 THEN 'de' " +
        "WHEN len(list_filter(toks, x -> x = 'table')) >= 3 THEN 'es' " +
        "ELSE 'und' END AS lang_guess FROM t ORDER BY doc_id"),
    "q26_fingerprint_dedup" ->
      ("WITH f AS (SELECT doc_id, md5(array_to_string(list_sort(list_distinct(" +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))), ' ')) AS fp " +
        "FROM documents) " +
        "SELECT fp, MIN(doc_id) AS keeper, COUNT(*) AS n_docs FROM f " +
        "GROUP BY fp ORDER BY keeper"),
    "q27_corpus_selection" ->
      ("WITH t AS (SELECT doc_id, lang, source, n_chars, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks, " +
        "md5(array_to_string(list_sort(list_distinct(" +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))), ' ')) AS fp " +
        "FROM documents WHERE lang IN ('en', 'de', 'es')), " +
        "q AS (SELECT * FROM t WHERE len(toks) >= 20 " +
        "AND CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) > 0.1 " +
        "AND CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS DOUBLE) / CAST(len(toks) AS DOUBLE) < 0.5), " +
        "d AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM q) " +
        "SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars " +
        "FROM d WHERE rn = 1 GROUP BY lang, source ORDER BY lang, source"),
    "q63_edit_distance" ->
      ("SELECT a.c_custkey AS id_a, b.c_custkey AS id_b, " +
        "CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist " +
        "FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey " +
        "AND length(a.c_name) = length(b.c_name) " +
        "WHERE a.c_custkey < 100 AND b.c_custkey < 100 " +
        "AND levenshtein(a.c_name, b.c_name) <= 2 ORDER BY id_a, id_b"),
    "q64_date_arithmetic" ->
      ("SELECT o_orderkey, " +
        "CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_ref, " +
        "CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due_date, " +
        "CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS VARCHAR) AS order_month " +
        "FROM orders ORDER BY o_orderkey"),
    "q67_tfidf" ->
      ("WITH toks AS (SELECT doc_id, unnest(list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '')) AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, COUNT(*) AS cnt FROM toks GROUP BY doc_id, term), " +
        "x AS (SELECT doc_id, term, cnt, " +
        "SUM(cnt) OVER (PARTITION BY doc_id) AS doc_len, " +
        "COUNT(*) OVER (PARTITION BY term) AS df FROM tf), " +
        "n AS (SELECT COUNT(*) AS n_docs FROM documents), " +
        "s AS (SELECT doc_id, term, (CAST(cnt AS DOUBLE) / CAST(doc_len AS DOUBLE)) * " +
        "ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS tfidf FROM x, n), " +
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id " +
        "ORDER BY tfidf DESC, term ASC) AS rk FROM s) " +
        "SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tfidf FROM r " +
        "WHERE rk <= 3 ORDER BY doc_id, rk"),
    "q68_stratified_sample" ->
      ("SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, n_chars FROM " +
        "(SELECT lang, doc_id, n_chars, ROW_NUMBER() OVER (PARTITION BY lang " +
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM documents) " +
        "WHERE rk <= 50 ORDER BY lang, rk"),
    "q69_doc_chunks" ->
      ("WITH t AS (SELECT doc_id, list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '') AS toks FROM documents), " +
        "s AS (SELECT doc_id, toks, unnest(list_filter(list_transform(" +
        "range(0, GREATEST(CAST(CEIL(CAST(len(toks) AS DOUBLE) / 40) AS BIGINT), 1)), " +
        "i -> i * 40), st -> st < len(toks) OR st = 0)) AS start FROM t) " +
        "SELECT doc_id, CAST(start / 40 AS BIGINT) AS chunk_id, " +
        "CAST(len(COALESCE(toks[start + 1 : start + 50], [])) AS BIGINT) AS n_tokens, " +
        "array_to_string(COALESCE(toks[start + 1 : start + 50], []), ' ') AS chunk_text " +
        "FROM s ORDER BY doc_id, chunk_id"),
    "q73_weighted_mix" ->
      ("WITH k AS (SELECT lang, CASE WHEN md5(CAST(doc_id AS VARCHAR)) < " +
        "(CASE lang WHEN 'en' THEN 'zz' WHEN 'de' THEN '8' WHEN 'es' THEN '8' " +
        "WHEN 'fr' THEN '4' ELSE '2' END) THEN 1 ELSE 0 END AS keep " +
        "FROM documents) " +
        "SELECT lang, COUNT(*) AS n_docs, CAST(SUM(keep) AS BIGINT) AS n_kept, " +
        "CAST(SUM(keep) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS kept_ratio " +
        "FROM k GROUP BY lang ORDER BY lang"),
    "q79_unigram_lm_score" ->
      ("WITH t AS (SELECT doc_id, unnest(list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '')) AS tok FROM documents), " +
        "f AS (SELECT tok, COUNT(*) AS tf FROM t GROUP BY tok), " +
        "n AS (SELECT SUM(tf) AS n_total FROM f) " +
        "SELECT doc_id, COUNT(*) AS n_tokens, " +
        "AVG(ln(CAST(tf AS DOUBLE) / CAST(n_total AS DOUBLE))) AS avg_logprob " +
        "FROM t JOIN f USING (tok), n GROUP BY doc_id ORDER BY doc_id"),
    "q80_decontamination" -> q80Sql,
    "q82_pii_redaction" ->
      ("WITH r AS (SELECT doc_id, 'doc ' || doc_id || ' contact user' || (doc_id % 50) || " +
        "'@example.com or admin@site' || (doc_id % 7) || '.org call +1-' || " +
        "lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || " +
        "lpad(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0') || " +
        "' from 192.168.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256) || " +
        "' :: ' || substring(text, 1, 40) AS raw FROM documents) " +
        "SELECT doc_id, " +
        "CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails, " +
        "CAST(len(regexp_extract_all(raw, '\\+1-\\d{3}-\\d{4}')) AS BIGINT) AS n_phones, " +
        "CAST(len(regexp_extract_all(raw, '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b')) AS BIGINT) AS n_ips, " +
        "regexp_replace(regexp_replace(regexp_replace(raw, " +
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), " +
        "'\\+1-\\d{3}-\\d{4}', '<PHONE>', 'g'), " +
        "'\\b(\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g') AS clean " +
        "FROM r ORDER BY doc_id"),
    "q83_length_buckets" ->
      ("WITH t AS (SELECT lang, len(list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '')) AS n_tokens FROM documents) " +
        "SELECT lang, CASE WHEN n_tokens < 64 THEN 'a_0-63' " +
        "WHEN n_tokens < 128 THEN 'b_64-127' WHEN n_tokens < 256 THEN 'c_128-255' " +
        "WHEN n_tokens < 512 THEN 'd_256-511' ELSE 'e_512+' END AS bucket, " +
        "COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens " +
        "FROM t GROUP BY 1, 2 ORDER BY lang, bucket"),
    "q84_sequence_packing" ->
      ("WITH t AS (SELECT lang, doc_id, doc_id % 8 AS shard, CAST(len(list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens FROM documents), " +
        "o AS (SELECT lang, doc_id, shard, n_tokens, COALESCE(SUM(n_tokens) OVER (" +
        "PARTITION BY lang, shard ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off " +
        "FROM t) " +
        "SELECT lang, shard, CAST(FLOOR(off / 2048) AS BIGINT) AS pack_id, COUNT(*) AS n_docs, " +
        "CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens, MIN(doc_id) AS first_doc " +
        "FROM o GROUP BY 1, 2, 3 ORDER BY lang, shard, pack_id"),
    "q92_repetition_signals" ->
      ("WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '') AS toks FROM documents), " +
        "b AS (SELECT doc_id, len(toks) AS n_tokens, " +
        "unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS g FROM t), " +
        "c AS (SELECT doc_id, g, COUNT(*) AS cnt, MIN(n_tokens) AS n_tokens FROM b GROUP BY 1, 2), " +
        "m AS (SELECT doc_id, MIN(n_tokens) AS n_tokens, MAX(cnt) AS max_bi FROM c GROUP BY doc_id), " +
        "tri AS (SELECT doc_id, GREATEST(len(toks) - 2, 0) AS total_tri, " +
        "len(list_distinct(list_transform(range(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS distinct_tri FROM t) " +
        "SELECT m.doc_id, CAST(m.n_tokens AS BIGINT) AS n_tokens, " +
        "CAST(max_bi * 2 AS DOUBLE) / CAST(m.n_tokens AS DOUBLE) AS top_bigram_frac, " +
        "CAST(total_tri - distinct_tri AS DOUBLE) / CAST(GREATEST(total_tri, 1) AS DOUBLE) AS dup_trigram_frac, " +
        "CAST(CASE WHEN CAST(max_bi * 2 AS DOUBLE) / CAST(m.n_tokens AS DOUBLE) >= 0.12 " +
        "OR CAST(total_tri - distinct_tri AS DOUBLE) / CAST(GREATEST(total_tri, 1) AS DOUBLE) >= 0.02 " +
        "THEN 1 ELSE 0 END AS BIGINT) AS repetition_flag " +
        "FROM m JOIN tri USING (doc_id) ORDER BY doc_id"),
    "q96_ngram_novelty" ->
      ("WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '') AS toks FROM documents), " +
        "s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS sh FROM t), " +
        "e AS (SELECT doc_id, md5(unnest(sh)) AS gh FROM s WHERE len(sh) > 0), " +
        "o AS (SELECT gh, MIN(doc_id) AS first_doc FROM e GROUP BY gh) " +
        "SELECT doc_id, COUNT(*) AS n_grams, " +
        "CAST(SUM(CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_seen, " +
        "CAST(COUNT(*) - SUM(CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END) AS DOUBLE) / " +
        "CAST(COUNT(*) AS BIGINT) AS novelty " +
        "FROM e JOIN o USING (gh) GROUP BY doc_id ORDER BY doc_id"),
    "q101_shard_manifest" ->
      ("WITH t AS (SELECT doc_id, " +
        "CAST(len(list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '')) AS BIGINT) AS n_tokens, " +
        "md5(CAST(doc_id AS VARCHAR)) AS hk FROM documents) " +
        "SELECT substr(hk, 1, 1) AS shard, " +
        "CAST(ROW_NUMBER() OVER w AS BIGINT) AS pos, doc_id, n_tokens, " +
        "CAST(COALESCE(SUM(n_tokens) OVER " +
        "(PARTITION BY substr(hk, 1, 1) ORDER BY hk, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) " +
        "AS tok_offset " +
        "FROM t WINDOW w AS " +
        "(PARTITION BY substr(hk, 1, 1) ORDER BY hk, doc_id) " +
        "ORDER BY shard, pos"),
    "q110_token_budget" ->
      ("WITH t AS (SELECT lang, doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks " +
        "FROM documents), " +
        "q AS (SELECT lang, doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, " +
        "CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) " +
        "AS distinct_ratio FROM t) " +
        "SELECT lang, CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank, doc_id, " +
        "n_tokens, " +
        "CAST(SUM(n_tokens) OVER (PARTITION BY lang " +
        "ORDER BY distinct_ratio DESC, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
        "AS cum_tokens, " +
        "CAST(CASE WHEN SUM(n_tokens) OVER (PARTITION BY lang " +
        "ORDER BY distinct_ratio DESC, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens < 2000 " +
        "THEN 1 ELSE 0 END AS BIGINT) AS kept " +
        "FROM q WINDOW w AS " +
        "(PARTITION BY lang ORDER BY distinct_ratio DESC, doc_id) " +
        "ORDER BY lang, rank"),
    // both engines md5 the same utf8 bytes; upper() is engine-safe on
    // this corpus (the q54 precedent)
    "q117_corpus_diff" ->
      ("WITH cur AS (SELECT doc_id, md5(text) AS h_cur FROM documents " +
        "WHERE doc_id % 7 <> 3), " +
        "prev AS (SELECT doc_id, md5(CASE WHEN doc_id % 13 = 0 " +
        "THEN upper(text) ELSE text END) AS h_prev FROM documents " +
        "WHERE doc_id % 10 <> 9) " +
        "SELECT COALESCE(cur.doc_id, prev.doc_id) AS doc_id, " +
        "CASE WHEN h_prev IS NULL THEN 'added' " +
        "WHEN h_cur IS NULL THEN 'removed' " +
        "WHEN h_cur <> h_prev THEN 'changed' " +
        "ELSE 'unchanged' END AS status " +
        "FROM cur FULL OUTER JOIN prev ON cur.doc_id = prev.doc_id " +
        "ORDER BY doc_id"),
    // SUM(BIGINT) is HUGEINT in DuckDB — the q103 lesson: cast before
    // the division so both engines divide identical doubles
    "q126_vocab_report" ->
      ("WITH t AS (SELECT doc_id, " +
        "unnest(list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '')) AS token FROM documents), " +
        "p AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tf, " +
        "CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df " +
        "FROM t GROUP BY token), " +
        "tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS total FROM p) " +
        "SELECT token, tf, df, " +
        "CAST(tf AS DOUBLE) / CAST(total AS DOUBLE) AS coverage " +
        "FROM p, tot ORDER BY tf DESC, token LIMIT 100"),
    // same md5 first-nibble both engines evaluate (q120/q121 pattern)
    "q127_hashing_vectorizer" ->
      ("WITH t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents) " +
        "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, " +
        "array_to_string(list_transform(range(0, 16), b -> " +
        "CAST(len(list_filter(toks, tk -> " +
        "strpos('0123456789abcdef', substr(md5(tk), 1, 1)) - 1 = b)) " +
        "AS BIGINT)), ',') AS vec " +
        "FROM t ORDER BY doc_id"),
    // mirrors bigramLmScore: bigrams via adjacent list positions, the
    // same add-one model; ln agreement is within the 1e-9 rounding
    // both engines' float compare uses (the q79 precedent)
    "q129_bigram_lm_score" ->
      ("WITH t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
        "f AS (SELECT * FROM t WHERE len(toks) >= 2), " +
        "bg AS (SELECT doc_id, toks[CAST(p AS INT)] AS w1, " +
        "toks[CAST(p + 1 AS INT)] AS w2 " +
        "FROM f, unnest(range(1, len(toks))) u(p)), " +
        "db AS (SELECT doc_id, w1, w2, COUNT(*) AS cnt " +
        "FROM bg GROUP BY 1, 2, 3), " +
        "c2 AS (SELECT w1, w2, CAST(SUM(cnt) AS BIGINT) AS c2 " +
        "FROM db GROUP BY 1, 2), " +
        "c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 " +
        "FROM c2 GROUP BY 1), " +
        "vv AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM " +
        "(SELECT unnest(toks) AS tok FROM f)) " +
        "SELECT db.doc_id, CAST(SUM(db.cnt) AS BIGINT) AS n_bigrams, " +
        "SUM(CAST(db.cnt AS DOUBLE) * ln((CAST(c2.c2 AS DOUBLE) + 1.0) / " +
        "(CAST(c1.c1 AS DOUBLE) + CAST(vv.v AS DOUBLE)))) / " +
        "CAST(SUM(db.cnt) AS DOUBLE) AS avg_logprob " +
        "FROM db JOIN c2 ON db.w1 = c2.w1 AND db.w2 = c2.w2 " +
        "JOIN c1 ON db.w1 = c1.w1 CROSS JOIN vv " +
        "GROUP BY db.doc_id ORDER BY db.doc_id"),
    // mirrors bm25TopK: same Okapi formula with literal constants;
    // the k boundary ranks on the same 1e-9 fixed-point score so the
    // selected set is deterministic cross-engine
    // q229 (streaming postings maintenance) shares this SQL verbatim:
    // docs stream exactly once, so the drained doclen/postings state
    // tables EQUAL the batch relations and the scoring tail is
    // identical arithmetic
    "q130_bm25_topk" -> q130Sql,
    "q229_streaming_bm25" -> q130Sql,
    // three unrolled BPE merge rounds over the word-frequency table;
    // see bpeRound for the leftmost-non-overlapping application CTEs
    "q131_bpe_merges" ->
      ("WITH words AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq " +
        "FROM (SELECT unnest(list_filter(string_split_regex(text, " +
        "'\\s+'), x -> x <> '')) AS w FROM documents) GROUP BY w), " +
        "s0 AS (SELECT w, freq, CAST(u.p AS BIGINT) AS pos, " +
        "substr(w, CAST(u.p + 1 AS INT), 1) AS sym " +
        "FROM words, unnest(range(len(w))) u(p)), " +
        bpeRound("s0", 1) + ", " +
        bpeRound("s1", 2) + ", " +
        bpeRound("s2", 3) + ", " +
        "tw AS (SELECT w, freq, string_agg(sym, ' ' ORDER BY pos) " +
        "AS seg FROM s3 GROUP BY w, freq " +
        "ORDER BY freq DESC, w ASC LIMIT 20) " +
        "SELECT kind, r, a, b, n FROM (" +
        "SELECT 'merge' AS kind, CAST(1 AS BIGINT) AS r, a, b, " +
        "cnt AS n FROM b1 " +
        "UNION ALL SELECT 'merge', CAST(2 AS BIGINT), a, b, cnt FROM b2 " +
        "UNION ALL SELECT 'merge', CAST(3 AS BIGINT), a, b, cnt FROM b3 " +
        "UNION ALL SELECT 'word', CAST(0 AS BIGINT), w, seg, freq " +
        "FROM tw) ORDER BY kind, r, a"),
    // q244: the q131 trainer run TWICE (snapshot = doc_id % 10 <> 9
    // vs full corpus), merge tables diffed rank by rank — prefixed CTE
    // chains keep the two trainings independent inside one query.
    // q350 (the streaming twin off the maintained (w, split) word
    // state) shares this SQL verbatim.
    "q244_bpe_vocab_drift" -> q244DriftSql,
    // q131's trainer CTEs collapsed to a (word → token count) vocab,
    // then one corpus join — the BPE train→apply composition
    "q134_bpe_tokenize" ->
      ("WITH words AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq " +
        "FROM (SELECT unnest(list_filter(string_split_regex(text, " +
        "'\\s+'), x -> x <> '')) AS w FROM documents) GROUP BY w), " +
        "s0 AS (SELECT w, freq, CAST(u.p AS BIGINT) AS pos, " +
        "substr(w, CAST(u.p + 1 AS INT), 1) AS sym " +
        "FROM words, unnest(range(len(w))) u(p)), " +
        bpeRound("s0", 1) + ", " +
        bpeRound("s1", 2) + ", " +
        bpeRound("s2", 3) + ", " +
        "vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_syms " +
        "FROM s3 GROUP BY w), " +
        "tok AS (SELECT doc_id, " +
        "unnest(list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '')) AS w FROM documents) " +
        "SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words, " +
        "CAST(SUM(vocab.n_syms) AS BIGINT) AS n_tokens, " +
        "CAST(SUM(vocab.n_syms) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) " +
        "AS tokens_per_word " +
        "FROM tok JOIN vocab USING (w) GROUP BY tok.doc_id " +
        "ORDER BY tok.doc_id"),
    // α=0.5 temperature quotas: sqrt + a lang-ordered fold keep every
    // double bit-identical cross-engine; md5 hash-rank selection
    "q135_temperature_mix" ->
      ("WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM documents GROUP BY lang), " +
        "s AS (SELECT lang, sqrt(CAST(n AS DOUBLE)) AS sv FROM c), " +
        "tot AS (SELECT list_reduce(list(sv ORDER BY lang), " +
        "(a, b) -> a + b) AS t FROM s), " +
        "q AS (SELECT lang, CAST(floor(CAST(250 AS DOUBLE) * sv / " +
        "tot.t) AS BIGINT) AS quota FROM s CROSS JOIN tot), " +
        "r AS (SELECT doc_id, lang, source, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY " +
        "md5('mix|' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) " +
        "AS rk FROM documents) " +
        "SELECT r.doc_id, r.lang, r.source, r.rk FROM r " +
        "JOIN q USING (lang) WHERE r.rk <= q.quota " +
        "ORDER BY r.doc_id"),
    // q176: exact per-cap truncation cost (docs cut, token mass lost)
    "q176_truncation_audit" ->
      ("WITH d AS (SELECT len(list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '')) AS n " +
        "FROM documents), " +
        "a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n) AS BIGINT) AS total_tokens, " +
        "CAST(SUM(CASE WHEN n > 32 THEN 1 ELSE 0 END) AS BIGINT) AS d32, " +
        "CAST(SUM(greatest(n - 32, 0)) AS BIGINT) AS t32, " +
        "CAST(SUM(CASE WHEN n > 64 THEN 1 ELSE 0 END) AS BIGINT) AS d64, " +
        "CAST(SUM(greatest(n - 64, 0)) AS BIGINT) AS t64, " +
        "CAST(SUM(CASE WHEN n > 128 THEN 1 ELSE 0 END) AS BIGINT) AS d128, " +
        "CAST(SUM(greatest(n - 128, 0)) AS BIGINT) AS t128 FROM d), " +
        "u AS (SELECT CAST(32 AS BIGINT) AS cap, n_docs, total_tokens, " +
        "d32 AS docs_truncated, t32 AS tokens_dropped FROM a " +
        "UNION ALL SELECT CAST(64 AS BIGINT), n_docs, total_tokens, d64, t64 FROM a " +
        "UNION ALL SELECT CAST(128 AS BIGINT), n_docs, total_tokens, d128, t128 FROM a) " +
        "SELECT cap, n_docs, total_tokens, docs_truncated, tokens_dropped, " +
        "CAST(tokens_dropped AS DOUBLE) / CAST(total_tokens AS DOUBLE) " +
        "AS drop_ratio FROM u ORDER BY cap"),
    // q177: longest same-token run per doc — the row-local fold pinned
    // by the relational gaps-and-islands spelling
    "q177_repetition_runs" ->
      ("WITH t AS (SELECT doc_id, list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '') AS toks " +
        "FROM documents), " +
        "f AS (SELECT * FROM t WHERE len(toks) > 0), " +
        "e AS (SELECT doc_id, p AS pos, toks[CAST(p + 1 AS INT)] AS tok " +
        "FROM (SELECT doc_id, toks, unnest(range(0, len(toks))) AS p FROM f)), " +
        "r AS (SELECT doc_id, tok, pos, pos - ROW_NUMBER() OVER " +
        "(PARTITION BY doc_id, tok ORDER BY pos) AS isl FROM e), " +
        "runs AS (SELECT doc_id, COUNT(*) AS run FROM r " +
        "GROUP BY doc_id, tok, isl), " +
        "m AS (SELECT doc_id, MAX(run) AS max_run FROM runs GROUP BY doc_id) " +
        "SELECT f.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, " +
        "CAST(max_run AS BIGINT) AS max_run, " +
        "CAST(CASE WHEN max_run >= 3 THEN 1 ELSE 0 END AS BIGINT) AS flagged " +
        "FROM f JOIN m ON f.doc_id = m.doc_id ORDER BY f.doc_id"),
    // q172: exact token-mass coverage of the top-k vocab types
    // (ties lexical) for k in {10, 100, 1000}
    "q172_vocab_coverage" ->
      ("WITH t AS (SELECT unnest(list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '')) AS token " +
        "FROM documents), " +
        "tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tf FROM t " +
        "GROUP BY token), " +
        "r AS (SELECT token, tf, ROW_NUMBER() OVER " +
        "(ORDER BY tf DESC, token) AS rk FROM tf), " +
        "a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types, " +
        "CAST(SUM(tf) AS BIGINT) AS total_tokens, " +
        "CAST(SUM(CASE WHEN rk <= 10 THEN tf ELSE 0 END) AS BIGINT) AS c10, " +
        "CAST(SUM(CASE WHEN rk <= 100 THEN tf ELSE 0 END) AS BIGINT) AS c100, " +
        "CAST(SUM(CASE WHEN rk <= 1000 THEN tf ELSE 0 END) AS BIGINT) AS c1000 " +
        "FROM r), " +
        "u AS (SELECT CAST(10 AS BIGINT) AS k, n_types, total_tokens, " +
        "c10 AS covered_tokens FROM a " +
        "UNION ALL SELECT CAST(100 AS BIGINT), n_types, total_tokens, " +
        "c100 FROM a " +
        "UNION ALL SELECT CAST(1000 AS BIGINT), n_types, total_tokens, " +
        "c1000 FROM a) " +
        "SELECT k, n_types, total_tokens, covered_tokens, " +
        "CAST(covered_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) " +
        "AS coverage FROM u ORDER BY k"),
    // q173: per-language unigram entropy over exact tf ratios; ln/exp
    // per the q79 1e-9 comparator precedent
    "q173_corpus_entropy" -> q173Sql,
    // q312: q173 per micro-batch ((lang, token) count ledger) —
    // shares q173's oracle verbatim
    "q312_streaming_corpus_entropy" -> q173Sql,
    // q171: token-budget mix plan — exact per-source token counts,
    // budget = total // 2, α=0.5 weights with the source-ordered fold
    // (q135's bit-identical-double argument), floor'd targets
    "q171_token_budget_plan" ->
      ("WITH d AS (SELECT source, len(list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '')) AS tc " +
        "FROM documents), " +
        "c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(tc) AS BIGINT) AS n_tokens FROM d GROUP BY source), " +
        "tt AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 2 AS b FROM c), " +
        "s AS (SELECT source, n_docs, n_tokens, " +
        "sqrt(CAST(n_tokens AS DOUBLE)) AS w FROM c), " +
        "tot AS (SELECT list_reduce(list(w ORDER BY source), " +
        "(a, b) -> a + b) AS t FROM s), " +
        "p AS (SELECT source, n_docs, n_tokens, " +
        "CAST(floor(CAST(tt.b AS DOUBLE) * w / tot.t) AS BIGINT) " +
        "AS target_tokens FROM s CROSS JOIN tot CROSS JOIN tt) " +
        "SELECT source, n_docs, n_tokens, target_tokens, " +
        "CAST(target_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS epochs, " +
        "CAST(CASE WHEN CAST(target_tokens AS DOUBLE) / " +
        "CAST(n_tokens AS DOUBLE) > 1 THEN 1 ELSE 0 END AS BIGINT) " +
        "AS upsampled " +
        "FROM p ORDER BY source"),
    // doc-id-hash 80/10/10 assignment; leakage = val/test content
    // hash present among train content hashes
    "q136_dataset_split" ->
      ("WITH a AS (SELECT doc_id, md5(text) AS content_hash, " +
        "md5('split|' || CAST(doc_id AS VARCHAR)) AS hk " +
        "FROM documents), " +
        "b AS (SELECT *, (strpos('0123456789abcdef', " +
        "substr(hk, 1, 1)) - 1) * 16 + " +
        "strpos('0123456789abcdef', substr(hk, 2, 1)) - 1 AS bb " +
        "FROM a), " +
        "sp AS (SELECT doc_id, content_hash, CASE WHEN bb < 204 " +
        "THEN 'train' WHEN bb < 230 THEN 'val' ELSE 'test' END " +
        "AS split FROM b), " +
        "th AS (SELECT DISTINCT content_hash AS t_hash FROM sp " +
        "WHERE split = 'train') " +
        "SELECT sp.doc_id, sp.split, (sp.split <> 'train' AND " +
        "th.t_hash IS NOT NULL) AS leaked FROM sp " +
        "LEFT JOIN th ON sp.content_hash = th.t_hash " +
        "ORDER BY sp.doc_id"),
    // positions are 0-based (unnest ordinal − 1) to mirror posexplode
    "q137_phrase_search" ->
      ("WITH t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
        "p AS (SELECT doc_id, CAST(u.p - 1 AS BIGINT) AS pos, " +
        "toks[CAST(u.p AS INT)] AS term " +
        "FROM t, unnest(range(1, len(toks) + 1)) u(p)) " +
        "SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches, " +
        "CAST(MIN(a.pos) AS BIGINT) AS first_pos " +
        "FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 " +
        "WHERE a.term = 'table' AND b.term = 'scan' " +
        "GROUP BY a.doc_id ORDER BY a.doc_id"),
    // integer counts everywhere; PMI operand grouping mirrors the
    // engine exactly: (c_ab·n·n) / (p·c1·c2), one ln per row
    "q138_cooccurrence_pmi" ->
      ("WITH t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
        "po AS (SELECT doc_id, CAST(u.p AS INT) AS i, " +
        "toks[CAST(u.p AS INT)] AS w " +
        "FROM t, unnest(range(1, len(toks) + 1)) u(p)), " +
        "pr AS (SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2 " +
        "FROM po a JOIN po b ON a.doc_id = b.doc_id " +
        "AND b.i > a.i AND b.i <= a.i + 2), " +
        "pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab " +
        "FROM pr GROUP BY 1, 2), " +
        "un AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM " +
        "(SELECT unnest(toks) AS w FROM t) GROUP BY 1), " +
        "nt AS (SELECT CAST(SUM(len(toks)) AS BIGINT) AS n FROM t), " +
        "np AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS p FROM pc), " +
        "top AS (SELECT w1, w2, c_ab FROM pc " +
        "ORDER BY c_ab DESC, w1, w2 LIMIT 30) " +
        "SELECT top.w1, top.w2, top.c_ab, " +
        "ln((CAST(top.c_ab AS DOUBLE) * nt.n * nt.n) / " +
        "(np.p * u1.c * u2.c)) AS pmi " +
        "FROM top JOIN un u1 ON u1.w = top.w1 " +
        "JOIN un u2 ON u2.w = top.w2 CROSS JOIN nt CROSS JOIN np " +
        "ORDER BY w1, w2"),
    // entropy folds per-source lang counts in lang order from 0.0 —
    // the same accumulation the engine's HOF aggregate performs
    "q139_corpus_card" ->
      ("WITH d AS (SELECT source, lang, n_chars, " +
        "CAST(len(list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '')) AS BIGINT) AS tc, md5(text) AS h " +
        "FROM documents), " +
        "b AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars, " +
        "CAST(SUM(tc) AS BIGINT) AS n_tokens, " +
        "CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs, " +
        "CAST(COUNT(DISTINCT h) AS BIGINT) AS nd " +
        "FROM d GROUP BY source), " +
        "lc AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c " +
        "FROM d GROUP BY 1, 2), " +
        "e AS (SELECT lc.source, " +
        "list_reduce(list_prepend(0.0, list_transform(" +
        "list(lc.c ORDER BY lc.lang), x -> " +
        "-(CAST(x AS DOUBLE) / b.n_docs) * " +
        "ln(CAST(x AS DOUBLE) / b.n_docs))), (a, v) -> a + v) AS ent " +
        "FROM lc JOIN b USING (source) GROUP BY lc.source, b.n_docs) " +
        "SELECT b.source, b.n_docs, b.n_chars, b.n_tokens, b.n_langs, " +
        "e.ent AS lang_entropy, " +
        "1.0 - CAST(b.nd AS DOUBLE) / CAST(b.n_docs AS DOUBLE) " +
        "AS dup_ratio FROM b JOIN e ON b.source = e.source " +
        "ORDER BY b.source"),
    // q129's model CTEs restricted to the q136 train split; unseen
    // bigrams/prefixes COALESCE to the add-one limits
    "q140_heldout_perplexity" ->
      ("WITH t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
        "f AS (SELECT t.*, CASE WHEN bb < 204 THEN 'train' " +
        "WHEN bb < 230 THEN 'val' ELSE 'test' END AS split FROM " +
        "(SELECT *, (strpos('0123456789abcdef', substr(md5('split|' " +
        "|| CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 + " +
        "strpos('0123456789abcdef', substr(md5('split|' || " +
        "CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS bb FROM t) t " +
        "WHERE len(toks) >= 2), " +
        "bg AS (SELECT doc_id, split, toks[CAST(p AS INT)] AS w1, " +
        "toks[CAST(p + 1 AS INT)] AS w2 " +
        "FROM f, unnest(range(1, len(toks))) u(p)), " +
        "db AS (SELECT doc_id, split, w1, w2, COUNT(*) AS cnt " +
        "FROM bg GROUP BY 1, 2, 3, 4), " +
        "c2 AS (SELECT w1, w2, CAST(SUM(cnt) AS BIGINT) AS c2 " +
        "FROM db WHERE split = 'train' GROUP BY 1, 2), " +
        "c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 " +
        "FROM c2 GROUP BY 1), " +
        "vv AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM " +
        "(SELECT unnest(toks) AS tok FROM f WHERE split = 'train')) " +
        "SELECT db.doc_id, db.split, " +
        "CAST(SUM(db.cnt) AS BIGINT) AS n_bigrams, " +
        "SUM(CAST(db.cnt AS DOUBLE) * " +
        "ln((CAST(COALESCE(c2.c2, 0) AS DOUBLE) + 1.0) / " +
        "(CAST(COALESCE(c1.c1, 0) AS DOUBLE) + CAST(vv.v AS DOUBLE)))) " +
        "/ CAST(SUM(db.cnt) AS DOUBLE) AS avg_logprob " +
        "FROM db LEFT JOIN c2 ON db.w1 = c2.w1 AND db.w2 = c2.w2 " +
        "LEFT JOIN c1 ON db.w1 = c1.w1 CROSS JOIN vv " +
        "WHERE db.split <> 'train' " +
        "GROUP BY db.doc_id, db.split ORDER BY db.doc_id"),
    // three cumulative predicates over one scan; exact counts
    "q141_curation_funnel" ->
      ("WITH d AS (SELECT doc_id, " +
        "CAST(len(list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '')) AS BIGINT) AS tc, md5(text) AS h " +
        "FROM documents), " +
        "k AS (SELECT d.*, doc_id = MIN(doc_id) OVER " +
        "(PARTITION BY h) AS keeper, " +
        "tc >= 30 AND tc <= 90 AS quality FROM d) " +
        "SELECT stage, n_docs, n_tokens FROM (" +
        "SELECT 's0_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(tc) AS BIGINT) AS n_tokens FROM k " +
        "UNION ALL SELECT 's1_exact_dedup', CAST(COUNT(*) AS BIGINT), " +
        "CAST(SUM(tc) AS BIGINT) FROM k WHERE keeper " +
        "UNION ALL SELECT 's2_quality', CAST(COUNT(*) AS BIGINT), " +
        "CAST(SUM(tc) AS BIGINT) FROM k WHERE keeper AND quality" +
        ") ORDER BY stage"),
    // q147: A-ES weighted sample — u from the first 12 md5 nibbles of
    // 'ws|'||doc_id (48-bit integer, exact in a double), key = ln(u)/w;
    // ln agreement sits inside the 1e-9 float rounding (q79 precedent).
    // q157 (the streaming top-k maintenance twin) shares this SQL
    // verbatim: the reservoir merge is associative, so the drained
    // stream must equal the one-shot batch answer exactly.
    "q147_weighted_sample" -> q147Sql,
    "q157_streaming_weighted_sample" -> q147Sql,
    // q222: per-source HyperLogLog distinct-content estimate — md5
    // nibble registers (q184 cell discipline), EXACT BIGINT harmonic
    // sum via 2^(49-rank) scaling, one shared estimator formula with a
    // single division + the linear-counting small-range branch.
    // q223 (the streaming register-maintenance twin) shares this SQL
    // verbatim: register max is associative, so any micro-batch split
    // drains to the batch sketch (the q147/q157 pattern)
    "q222_hll_distinct" -> q222Sql,
    "q223_streaming_hll" -> q222Sql,
    // q234: the same sketch at (source, lang) cell grain — register
    // max-merge over lang reproduces q222 exactly (Wave6Spec)
    "q234_hll_cells" -> hllSql(Seq("source", "lang")),
    // q302: q234 per micro-batch (register append + max-merge drain,
    // the q223 discipline at cell grain) — shares q234's SQL
    "q302_streaming_hll_cells" -> hllSql(Seq("source", "lang")),
    // q236: per-source point-biserial correlation between length and
    // the q211 quality flag — exact integer sufficient statistics,
    // one shared double formula, degenerate cells guarded identically
    "q236_length_quality_corr" ->
      ("WITH t AS (SELECT source, n_chars AS x, list_filter(" +
        "string_split_regex(text, '\\s+'), x2 -> x2 <> '') AS toks " +
        "FROM documents), " +
        "b AS (SELECT source, x, CAST(len(toks) >= 20 AND " +
        "CAST(len(list_distinct(toks)) AS DOUBLE) / " +
        "CAST(len(toks) AS DOUBLE) > 0.1 AND " +
        "CAST(len(list_filter(toks, w -> w = 'the' OR w = 'a')) " +
        "AS DOUBLE) / CAST(len(toks) AS DOUBLE) < 0.5 AS BIGINT) AS y " +
        "FROM t), " +
        "p AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx, " +
        "CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy " +
        "FROM b GROUP BY source), " +
        "f AS (SELECT source, n, sy, " +
        "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
        "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num, " +
        "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
        "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx, " +
        "CAST(n AS DOUBLE) * CAST(sy AS DOUBLE) - " +
        "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy FROM p) " +
        "SELECT source, n AS n_docs, sy AS n_quality, " +
        "CASE WHEN vx > 0.0 AND vy > 0.0 THEN num / sqrt(vx * vy) " +
        "ELSE 0.0 END AS r, " +
        "CAST(CASE WHEN vx > 0.0 AND vy > 0.0 THEN 0 ELSE 1 END " +
        "AS BIGINT) AS degenerate " +
        "FROM f ORDER BY source"),
    // q239/q240: the trained Naive-Bayes quality classifier — integer
    // (token, class) sufficient statistics, top-256 vocab (cnt DESC,
    // token — deterministic in both engines), Laplace log-odds
    // fixed-point-rounded to micro units BEFORE the per-doc sum, so
    // document scores are exact BIGINT sums (no float accumulation
    // order anywhere). Label = the q236 quality flag.
    "q239_nb_quality_train" -> nbTrainSql,
    // q246: the q239 sufficient statistics maintained per micro-batch
    // (SUM-merge, batch-tagged rows) — counts are associative, so any
    // split drains to the batch model: q239's SQL verbatim
    "q246_streaming_nb_train" -> nbTrainSql,
    "q240_nb_quality_apply" -> (nbScoredSql +
      "SELECT doc_id, y, n_vocab_tokens, score_micro, predicted " +
      "FROM scored ORDER BY doc_id"),
    // q287: exact ROC AUC (Mann-Whitney over the score histogram,
    // half-credit ties) — trained score vs the n_chars baseline;
    // integer arithmetic until the one final division
    "q287_nb_auc" -> (nbScoredSql +
      ", auc_sc AS (SELECT qs.y, qs.score_micro, d.n_chars " +
      "FROM scored qs JOIN documents d USING (doc_id)), " +
      "auc_u AS (SELECT 'nb_log_odds' AS scorer, score_micro AS score, y " +
      "FROM auc_sc UNION ALL " +
      "SELECT 'length_baseline' AS scorer, n_chars AS score, y FROM auc_sc), " +
      "auc_h AS (SELECT scorer, score, CAST(SUM(y) AS BIGINT) AS np, " +
      "CAST(SUM(1 - y) AS BIGINT) AS nn FROM auc_u GROUP BY 1, 2), " +
      "auc_c AS (SELECT scorer, np, nn, CAST(COALESCE(SUM(nn) OVER " +
      "(PARTITION BY scorer ORDER BY score " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) " +
      "AS below FROM auc_h), " +
      "auc_t AS (SELECT scorer, " +
      "CAST(SUM(np * (2 * below + nn)) AS BIGINT) AS num2, " +
      "CAST(SUM(np) AS BIGINT) AS p, CAST(SUM(nn) AS BIGINT) AS n " +
      "FROM auc_c GROUP BY 1) " +
      "SELECT scorer, p AS n_pos, n AS n_neg, " +
      "CAST(num2 AS DOUBLE) / (2.0 * CAST(p AS DOUBLE) * " +
      "CAST(n AS DOUBLE)) AS auc FROM auc_t ORDER BY scorer"),
    // q325: NB operating-point sweep — confusion quadrant + P/R/F1 at
    // each score decile; exact integers to one division per column
    "q325_nb_pr_sweep" -> (nbScoredSql +
      ", q325h AS (SELECT score_micro AS score, CAST(SUM(y) AS BIGINT) " +
      "AS np, CAST(SUM(1 - y) AS BIGINT) AS nn FROM scored GROUP BY 1), " +
      "q325c AS (SELECT score, np, nn, " +
      "CAST(COALESCE(SUM(np) OVER wp, 0) AS BIGINT) AS np_below, " +
      "CAST(COALESCE(SUM(nn) OVER wp, 0) AS BIGINT) AS nn_below " +
      "FROM q325h WINDOW wp AS (ORDER BY score " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), " +
      "q325t AS (SELECT CAST(SUM(np) AS BIGINT) AS p, " +
      "CAST(SUM(nn) AS BIGINT) AS nneg FROM q325h), " +
      "q325d AS (SELECT decile, p, nneg, " +
      "(decile * (p + nneg) + 9) // 10 AS r FROM " +
      "(SELECT unnest(generate_series(1, 9)) AS decile) CROSS JOIN q325t) " +
      "SELECT CAST(d.decile AS BIGINT) AS decile, " +
      "CAST(h.score AS BIGINT) AS threshold_micro, " +
      "CAST(d.p - h.np_below - h.np AS BIGINT) AS tp, " +
      "CAST(d.nneg - h.nn_below - h.nn AS BIGINT) AS fp, " +
      "CAST(h.np_below + h.np AS BIGINT) AS fn, " +
      "CAST(h.nn_below + h.nn AS BIGINT) AS tn, " +
      "CASE WHEN (d.p - h.np_below - h.np) + " +
      "(d.nneg - h.nn_below - h.nn) = 0 THEN 0.0 ELSE " +
      "CAST(d.p - h.np_below - h.np AS DOUBLE) / " +
      "CAST((d.p - h.np_below - h.np) + (d.nneg - h.nn_below - h.nn) " +
      "AS DOUBLE) END AS precision, " +
      "CAST(d.p - h.np_below - h.np AS DOUBLE) / CAST(d.p AS DOUBLE) " +
      "AS recall, " +
      "CASE WHEN 2 * (d.p - h.np_below - h.np) + " +
      "(d.nneg - h.nn_below - h.nn) + (h.np_below + h.np) = 0 THEN 0.0 " +
      "ELSE CAST(2 * (d.p - h.np_below - h.np) AS DOUBLE) / " +
      "CAST(2 * (d.p - h.np_below - h.np) + " +
      "(d.nneg - h.nn_below - h.nn) + (h.np_below + h.np) AS DOUBLE) " +
      "END AS f1 " +
      "FROM q325d d JOIN q325c h ON d.r > h.np_below + h.nn_below " +
      "AND d.r <= h.np_below + h.nn_below + h.np + h.nn " +
      "ORDER BY decile"),
    // q326: Cohen's kappa for the NB gate and the lang-id guesser —
    // one division from integer marginals, HUGEINT products
    "q326_kappa_agreement" -> (nbScoredSql +
      ", kc1 AS (SELECT CAST(y AS VARCHAR) AS t, " +
      "CAST(predicted AS VARCHAR) AS g, CAST(COUNT(*) AS BIGINT) " +
      "AS cnt FROM scored GROUP BY 1, 2), " +
      "kg AS (SELECT lang AS t, CASE " +
      "WHEN len(list_filter(toks, x -> x = 'the')) >= 3 THEN 'en' " +
      "WHEN len(list_filter(toks, x -> x = 'data')) >= 3 THEN 'de' " +
      "WHEN len(list_filter(toks, x -> x = 'table')) >= 3 THEN 'es' " +
      "ELSE 'und' END AS g FROM (SELECT lang, " +
      "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
      "AS toks FROM documents)), " +
      "kc2 AS (SELECT t, g, CAST(COUNT(*) AS BIGINT) AS cnt " +
      "FROM kg GROUP BY 1, 2), " +
      "ka1 AS (SELECT CAST(SUM(cnt) AS HUGEINT) AS n, " +
      "CAST(SUM(CASE WHEN t = g THEN cnt ELSE 0 END) AS HUGEINT) " +
      "AS agree FROM kc1), " +
      "kr1 AS (SELECT SUM(CAST(COALESCE(r.r, 0) AS HUGEINT) * " +
      "COALESCE(c.c, 0)) AS src FROM " +
      "(SELECT t AS k, SUM(cnt) AS r FROM kc1 GROUP BY 1) r " +
      "FULL JOIN (SELECT g AS k, SUM(cnt) AS c FROM kc1 GROUP BY 1) c " +
      "USING (k)), " +
      "ka2 AS (SELECT CAST(SUM(cnt) AS HUGEINT) AS n, " +
      "CAST(SUM(CASE WHEN t = g THEN cnt ELSE 0 END) AS HUGEINT) " +
      "AS agree FROM kc2), " +
      "kr2 AS (SELECT SUM(CAST(COALESCE(r.r, 0) AS HUGEINT) * " +
      "COALESCE(c.c, 0)) AS src FROM " +
      "(SELECT t AS k, SUM(cnt) AS r FROM kc2 GROUP BY 1) r " +
      "FULL JOIN (SELECT g AS k, SUM(cnt) AS c FROM kc2 GROUP BY 1) c " +
      "USING (k)) " +
      "SELECT 'nb_vs_weak_label' AS task, CAST(n AS BIGINT) AS n, " +
      "CAST(agree AS BIGINT) AS agree, " +
      "CASE WHEN n * n = src THEN 0.0 ELSE " +
      "CAST(n * agree - src AS DOUBLE) / CAST(n * n - src AS DOUBLE) " +
      "END AS kappa FROM ka1 CROSS JOIN kr1 " +
      "UNION ALL " +
      "SELECT 'langid_vs_lang' AS task, CAST(n AS BIGINT) AS n, " +
      "CAST(agree AS BIGINT) AS agree, " +
      "CASE WHEN n * n = src THEN 0.0 ELSE " +
      "CAST(n * agree - src AS DOUBLE) / CAST(n * n - src AS DOUBLE) " +
      "END AS kappa FROM ka2 CROSS JOIN kr2 " +
      "ORDER BY task"),
    // q247: per-source confusion of the trained gate vs its weak label
    "q247_nb_confusion" -> (nbScoredSql +
      ", src AS (SELECT doc_id, source FROM documents), " +
      "cf AS (SELECT src.source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
      "CAST(SUM(CASE WHEN y = 1 AND predicted = 1 THEN 1 ELSE 0 END) " +
      "AS BIGINT) AS tp, " +
      "CAST(SUM(CASE WHEN y = 0 AND predicted = 1 THEN 1 ELSE 0 END) " +
      "AS BIGINT) AS fp, " +
      "CAST(SUM(CASE WHEN y = 1 AND predicted = 0 THEN 1 ELSE 0 END) " +
      "AS BIGINT) AS fn, " +
      "CAST(SUM(CASE WHEN y = 0 AND predicted = 0 THEN 1 ELSE 0 END) " +
      "AS BIGINT) AS tn " +
      "FROM scored JOIN src ON src.doc_id = scored.doc_id " +
      "GROUP BY src.source) " +
      "SELECT source, n_docs, tp, fp, fn, tn, " +
      "CAST(tp + tn AS DOUBLE) / CAST(n_docs AS DOUBLE) AS accuracy " +
      "FROM cf ORDER BY source"),
    // q255: the classifier trained on the historical snapshot vs the
    // full corpus, weight tables full-outer-joined token by token —
    // the q244 drift check applied to the model (two prefixed chains)
    "q255_nb_model_drift" ->
      ("WITH " + nbCtes("s", "WHERE doc_id % 10 <> 9") + ", " +
        nbCtes("f", "") + ", " +
        "sw AS (SELECT token, " + nbWeightExpr + " AS w " +
        "FROM sv CROSS JOIN stt), " +
        "fw AS (SELECT token, " + nbWeightExpr + " AS w " +
        "FROM fv CROSS JOIN ftt) " +
        "SELECT COALESCE(sw.token, fw.token) AS token, " +
        "CAST(CASE WHEN sw.token IS NOT NULL THEN 1 ELSE 0 END " +
        "AS BIGINT) AS in_snap, " +
        "CAST(CASE WHEN fw.token IS NOT NULL THEN 1 ELSE 0 END " +
        "AS BIGINT) AS in_full, " +
        "CAST(COALESCE(sw.w, 0) AS BIGINT) AS w_snap_micro, " +
        "CAST(COALESCE(fw.w, 0) AS BIGINT) AS w_full_micro, " +
        "CAST(CASE WHEN sw.token IS NOT NULL AND fw.token IS NOT NULL " +
        "THEN fw.w - sw.w ELSE 0 END AS BIGINT) AS delta_micro " +
        "FROM sw FULL OUTER JOIN fw ON sw.token = fw.token " +
        "ORDER BY token"),
    // q248: calibration — 2e6-micro (2-nat) score bins vs empirical
    // quality rate; exact-long bin arithmetic
    "q248_nb_calibration" -> (nbScoredSql +
      "SELECT CAST(FLOOR(CAST(score_micro AS DOUBLE) / 2000000.0) " +
      "AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
      "CAST(SUM(y) AS BIGINT) AS n_quality, " +
      "CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) " +
      "AS quality_rate FROM scored GROUP BY bin ORDER BY bin"),
    // q231: id-hash shard routing (16 md5 bits mod 32) + the exact
    // per-shard doc/token deviation from uniform
    "q231_shard_balance" ->
      ("WITH m AS (SELECT md5('shard|' || CAST(doc_id AS VARCHAR)) AS h, " +
        "CAST(len(list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '')) AS BIGINT) AS tc FROM documents), " +
        "d AS (SELECT CAST((" +
        "(strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096 + " +
        "(strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256 + " +
        "(strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16 + " +
        "(strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) % 32 " +
        "AS BIGINT) AS shard, tc FROM m), " +
        "p AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(tc) AS BIGINT) AS n_tokens FROM d GROUP BY shard), " +
        "t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS t_docs, " +
        "CAST(SUM(n_tokens) AS BIGINT) AS t_tokens FROM p) " +
        "SELECT shard, n_docs, n_tokens, " +
        "CAST(n_docs * 32 AS DOUBLE) / CAST(t_docs AS DOUBLE) - 1.0 " +
        "AS doc_dev, " +
        "CAST(n_tokens * 32 AS DOUBLE) / CAST(t_tokens AS DOUBLE) - 1.0 " +
        "AS token_dev " +
        "FROM p CROSS JOIN t ORDER BY shard"),
  )
  /** Shared by q80 (batch decontamination) and q185 (its streaming
    * form): a fixed eval side makes any micro-batch split of the train
    * stream drain to the batch answer, so one static SQL pins both.
    */
  private[oracles] def q80Sql: String =
    ("WITH t AS (SELECT doc_id, list_filter(" +
      "string_split_regex(text, '\\s+'), x -> x <> '') AS toks FROM documents), " +
      "s AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
      "range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS gram FROM t), " +
      "e AS (SELECT doc_id AS eval_id, gram FROM s WHERE doc_id % 100 = 0), " +
      "tr AS (SELECT doc_id AS train_id, gram FROM s WHERE doc_id % 100 <> 0) " +
      "SELECT train_id, eval_id, COUNT(DISTINCT gram) AS n_shared " +
      "FROM tr JOIN e USING (gram) GROUP BY train_id, eval_id " +
      "HAVING COUNT(DISTINCT gram) >= 2 ORDER BY train_id, eval_id")


  private def q130Sql: String =
      ("WITH t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
        "stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, " +
        "AVG(CAST(len(toks) AS DOUBLE)) AS avgdl FROM t), " +
        "q AS (SELECT * FROM (VALUES ('spark'), ('join'), ('stream')) " +
        "v(term)), " +
        "tf AS (SELECT doc_id, tok AS term, " +
        "CAST(COUNT(*) AS BIGINT) AS tf " +
        "FROM (SELECT doc_id, unnest(toks) AS tok FROM t) u " +
        "JOIN q ON u.tok = q.term GROUP BY 1, 2), " +
        "df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) " +
        "AS df FROM tf GROUP BY 1), " +
        "dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM t), " +
        "sc AS (SELECT tf.doc_id, " +
        "SUM(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5)) " +
        "* CAST(tf.tf AS DOUBLE) * 2.2 " +
        "/ (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl.dl / " +
        "stats.avgdl))) AS score " +
        "FROM tf JOIN df USING (term) JOIN dl USING (doc_id) " +
        "CROSS JOIN stats GROUP BY 1) " +
        "SELECT doc_id, score FROM (" +
        "SELECT doc_id, score, ROW_NUMBER() OVER (ORDER BY " +
        "CAST(floor(score * 1e9 + 0.5) AS BIGINT) DESC, doc_id) AS rk " +
        "FROM sc) WHERE rk <= 15 ORDER BY doc_id")

  /** q222/q223: register = first two md5 nibbles, rank = leading-zero
    * position of the next 48 bits (length(bin(v)) is the minimal-bit
    * length in BOTH engines), harmonic sum kept exact as Σ 2^(49-rank)
    * in BIGINT, estimator spelled once with one division per row.
    */
  private def q222Sql: String = hllSql(Seq("source"))

  /** The q222 estimator SQL at arbitrary key grain (q234 = (source,
    * lang) cells): registers, exact BIGINT harmonic sums and the
    * single-division estimator are identical — only the GROUP BY keys
    * change.
    */
  private[oracles] def hllSql(keys: Seq[String]): String = {
    val ks = keys.mkString(", ")
    val nib = (i: Int) =>
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1)"
    val vExpr = (3 to 14).zipWithIndex.map { case (i, j) =>
      val w = BigInt(16).pow(11 - j)
      if (w == BigInt(1)) nib(i) else s"${nib(i)} * $w"
    }.mkString(" + ")
    (s"WITH d AS (SELECT $ks, md5(text) AS h FROM documents), " +
      s"x AS (SELECT $ks, h, " +
      s"${nib(1)} * 16 + ${nib(2)} AS reg, " +
      s"$vExpr AS v FROM d), " +
      s"r AS (SELECT $ks, reg, MAX(CASE WHEN v = 0 THEN 49 " +
      s"ELSE 49 - length(bin(v)) END) AS mrho FROM x " +
      s"GROUP BY $ks, reg), " +
      s"p AS (SELECT $ks, CAST(COUNT(*) AS BIGINT) AS registers_hit, " +
      "CAST(SUM(CAST(pow(2.0, 49 - mrho) AS BIGINT)) AS BIGINT) " +
      s"AS s_hit FROM r GROUP BY $ks), " +
      s"e AS (SELECT $ks, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
      "CAST(COUNT(DISTINCT h) AS BIGINT) AS exact_distinct FROM d " +
      s"GROUP BY $ks), " +
      s"q AS (SELECT $ks, n_docs, exact_distinct, registers_hit, " +
      "CAST(s_hit + (256 - registers_hit) * 562949953421312 AS BIGINT) " +
      "AS s_scaled, 256 - registers_hit AS v0 " +
      s"FROM e JOIN p USING ($ks)), " +
      s"q2 AS (SELECT $ks, n_docs, exact_distinct, registers_hit, " +
      "s_scaled, v0, " +
      "(0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 562949953421312.0 " +
      "/ CAST(s_scaled AS DOUBLE) AS raw_estimate FROM q), " +
      s"q3 AS (SELECT $ks, n_docs, exact_distinct, registers_hit, " +
      "s_scaled, raw_estimate, " +
      "CASE WHEN v0 > 0 AND raw_estimate <= 640.0 " +
      "THEN 256.0 * ln(256.0 / CAST(v0 AS DOUBLE)) " +
      "ELSE raw_estimate END AS estimate FROM q2) " +
      s"SELECT $ks, n_docs, exact_distinct, registers_hit, s_scaled, " +
      "raw_estimate, estimate, " +
      "(estimate - CAST(exact_distinct AS DOUBLE)) / " +
      "CAST(exact_distinct AS DOUBLE) AS rel_err " +
      s"FROM q3 ORDER BY $ks")
  }

  /** Shared q239/q240 prelude: the q236 quality-flag label, exact
    * (token, class) occurrence counts, the top-256 vocabulary
    * (cnt DESC, token — total order, so LIMIT is deterministic), and
    * the vocab-restricted class totals.
    */
  private def nbCommonSql: String = "WITH " + nbCtes("", "") + " "

  /** The q239 CTE chain with a name prefix and an optional doc filter
    * — q255 holds TWO trainings (snapshot vs full) in one query.
    */
  private def nbCtes(p: String, where: String): String =
    s"${p}t AS (SELECT doc_id, list_filter(string_split_regex(text, " +
      "'\\s+'), x -> x <> '') AS toks FROM documents " + where + "), " +
      s"${p}b AS (SELECT doc_id, toks, CAST(len(toks) >= 20 AND " +
      "CAST(len(list_distinct(toks)) AS DOUBLE) / " +
      "CAST(len(toks) AS DOUBLE) > 0.1 AND " +
      "CAST(len(list_filter(toks, w2 -> w2 = 'the' OR w2 = 'a')) " +
      "AS DOUBLE) / CAST(len(toks) AS DOUBLE) < 0.5 AS BIGINT) AS y " +
      s"FROM ${p}t), " +
      s"${p}e AS (SELECT y, unnest(toks) AS token FROM ${p}b), " +
      s"${p}c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt, " +
      "CAST(SUM(y) AS BIGINT) AS n1, CAST(SUM(1 - y) AS BIGINT) AS n0 " +
      s"FROM ${p}e GROUP BY token), " +
      s"${p}v AS (SELECT * FROM ${p}c ORDER BY cnt DESC, token " +
      "LIMIT 256), " +
      s"${p}tt AS (SELECT CAST(SUM(n1) AS BIGINT) AS t1, " +
      s"CAST(SUM(n0) AS BIGINT) AS t0 FROM ${p}v)"

  /** Laplace log-odds in micro units — the ONE shared double formula. */
  private def nbWeightExpr: String =
    "CAST(FLOOR((ln(CAST(n1 + 1 AS DOUBLE) / CAST(t1 + 256 AS DOUBLE)) - " +
      "ln(CAST(n0 + 1 AS DOUBLE) / CAST(t0 + 256 AS DOUBLE))) * 1000000 " +
      "+ 0.5) AS BIGINT)"

  /** q239 (and its streaming twin q246): the trained model table. */
  private def nbTrainSql: String = nbCommonSql +
    "SELECT token, n1, n0, " + nbWeightExpr + " AS w_micro " +
    "FROM v CROSS JOIN tt ORDER BY token"

  /** Shared q240/q247/q248 scored-documents relation. */
  private def nbScoredSql: String = nbCommonSql +
    ", w AS (SELECT token, " + nbWeightExpr + " AS w_micro " +
    "FROM v CROSS JOIN tt), " +
    "pr AS (SELECT CAST(FLOOR((ln(CAST(SUM(y) + 1 AS DOUBLE) / " +
    "CAST(COUNT(*) + 2 AS DOUBLE)) - " +
    "ln(CAST(COUNT(*) - SUM(y) + 1 AS DOUBLE) / " +
    "CAST(COUNT(*) + 2 AS DOUBLE))) * 1000000 + 0.5) AS BIGINT) " +
    "AS prior_micro FROM b), " +
    "ed AS (SELECT doc_id, unnest(toks) AS token FROM b), " +
    "pd AS (SELECT ed.doc_id, CAST(COUNT(*) AS BIGINT) " +
    "AS n_vocab_tokens, CAST(SUM(w.w_micro) AS BIGINT) AS wsum " +
    "FROM ed JOIN w ON ed.token = w.token GROUP BY ed.doc_id), " +
    "scored AS (SELECT b.doc_id, b.y, " +
    "CAST(COALESCE(pd.n_vocab_tokens, 0) AS BIGINT) AS n_vocab_tokens, " +
    "CAST(pr.prior_micro + COALESCE(pd.wsum, 0) AS BIGINT) " +
    "AS score_micro, " +
    "CAST(CASE WHEN pr.prior_micro + COALESCE(pd.wsum, 0) > 0 " +
    "THEN 1 ELSE 0 END AS BIGINT) AS predicted " +
    "FROM b LEFT JOIN pd ON pd.doc_id = b.doc_id CROSS JOIN pr) "

  private def q147Sql: String =
      ("WITH m0 AS (SELECT doc_id, lang, n_chars, " +
        "md5('ws|' || CAST(doc_id AS VARCHAR)) AS m FROM documents " +
        "WHERE n_chars > 0), " +
        "kdf AS (SELECT doc_id, lang, n_chars, " +
        "ln((CAST(" +
        "(strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 17592186044416 + " +
        "(strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 1099511627776 + " +
        "(strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 68719476736 + " +
        "(strpos('0123456789abcdef', substr(m, 4, 1)) - 1) * 4294967296 + " +
        "(strpos('0123456789abcdef', substr(m, 5, 1)) - 1) * 268435456 + " +
        "(strpos('0123456789abcdef', substr(m, 6, 1)) - 1) * 16777216 + " +
        "(strpos('0123456789abcdef', substr(m, 7, 1)) - 1) * 1048576 + " +
        "(strpos('0123456789abcdef', substr(m, 8, 1)) - 1) * 65536 + " +
        "(strpos('0123456789abcdef', substr(m, 9, 1)) - 1) * 4096 + " +
        "(strpos('0123456789abcdef', substr(m, 10, 1)) - 1) * 256 + " +
        "(strpos('0123456789abcdef', substr(m, 11, 1)) - 1) * 16 + " +
        "(strpos('0123456789abcdef', substr(m, 12, 1)) - 1) * 1 " +
        "AS DOUBLE) + 0.5) / 281474976710656.0) / CAST(n_chars AS DOUBLE) " +
        "AS es_key FROM m0), " +
        "r AS (SELECT doc_id, lang, n_chars, es_key, ROW_NUMBER() OVER " +
        "(ORDER BY CAST(floor(es_key * 1e9 + 0.5) AS BIGINT) DESC, doc_id) " +
        "AS rk FROM kdf) " +
        "SELECT CAST(rk AS BIGINT) AS rk, doc_id, lang, n_chars, es_key " +
        "FROM r WHERE rk <= 200 ORDER BY rk")

  // q345–q349 PII family: deterministic conditional plant (the q82
  // discipline — real detectors over arithmetic-planted PII), shared
  // by the incidence report, the redacted-copy manifest, and the
  // streaming twin
  private val piiPlantCte =
    "piidocs AS (SELECT doc_id, source, text || " +
      "CASE WHEN doc_id % 3 = 0 THEN ' contact user' || (doc_id % 50) || " +
      "'@example.com' ELSE '' END || " +
      "CASE WHEN doc_id % 4 = 0 THEN ' call +1-' || " +
      "lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || " +
      "lpad(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0') ELSE '' END || " +
      "CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' || (doc_id % 256) || " +
      "'.' || ((doc_id * 7) % 256) ELSE '' END AS raw FROM documents)"
  private val piiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val piiPhoneRe = "\\+1-\\d{3}-\\d{4}"
  private val piiIpRe = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  private[oracles] def piiIncidenceSql: String =
    s"WITH $piiPlantCte, " +
      "piih AS (SELECT source, length(raw) AS n_chars, " +
      s"len(regexp_extract_all(raw, '$piiEmailRe')) AS n_email, " +
      s"len(regexp_extract_all(raw, '$piiPhoneRe')) AS n_phone, " +
      s"len(regexp_extract_all(raw, '$piiIpRe')) AS n_ip FROM piidocs) " +
      "SELECT source, COUNT(*) AS n_docs, " +
      "CAST(SUM(CASE WHEN n_email + n_phone + n_ip > 0 THEN 1 ELSE 0 END) " +
      "AS BIGINT) AS n_docs_pii, " +
      "CAST(SUM(n_email) AS BIGINT) AS n_email, " +
      "CAST(SUM(n_phone) AS BIGINT) AS n_phone, " +
      "CAST(SUM(n_ip) AS BIGINT) AS n_ip, " +
      "CAST(SUM(n_email + n_phone + n_ip) * 10000 AS DOUBLE) / " +
      "CAST(SUM(n_chars) AS DOUBLE) AS pii_per_10k " +
      "FROM piih GROUP BY source ORDER BY source"

  /** q353 / q354: per-source scrub-job sizing off the planted corpus —
    * docs that change, spans to replace, raw/clean char mass of the
    * changing docs and the byte delta.
    */
  private def piiYieldSql: String =
    s"WITH $piiPlantCte, " +
      "piiy AS (SELECT source, length(raw) AS nr, " +
      "length(regexp_replace(regexp_replace(regexp_replace(raw, " +
      s"'$piiEmailRe', '<EMAIL>', 'g'), " +
      s"'$piiPhoneRe', '<PHONE>', 'g'), " +
      s"'$piiIpRe', '<IP>', 'g')) AS nc, " +
      s"len(regexp_extract_all(raw, '$piiEmailRe')) + " +
      s"len(regexp_extract_all(raw, '$piiPhoneRe')) + " +
      s"len(regexp_extract_all(raw, '$piiIpRe')) AS spans FROM piidocs) " +
      "SELECT source, " +
      "CAST(SUM(CASE WHEN spans > 0 THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS n_docs_pii, " +
      "CAST(SUM(spans) AS BIGINT) AS n_spans, " +
      "CAST(SUM(CASE WHEN spans > 0 THEN nr ELSE 0 END) AS BIGINT) " +
      "AS chars_in, " +
      "CAST(SUM(CASE WHEN spans > 0 THEN nc ELSE 0 END) AS BIGINT) " +
      "AS chars_out, " +
      "CAST(SUM(CASE WHEN spans > 0 THEN nc ELSE 0 END) - " +
      "SUM(CASE WHEN spans > 0 THEN nr ELSE 0 END) AS BIGINT) " +
      "AS chars_delta " +
      "FROM piiy GROUP BY source ORDER BY source"

  private val sql2: Map[String, String] = Map(
    "q345_pii_incidence" -> piiIncidenceSql,
    // block 19: tokenizer health + scrub sizing
    "q350_streaming_bpe_drift" -> q244DriftSql,
    "q351_oov_pressure" -> oovSql,
    "q352_streaming_oov_pressure" -> oovSql,
    "q353_redaction_yield" -> piiYieldSql,
    "q354_streaming_redaction_yield" -> piiYieldSql,
    "q346_pii_contact_extract" ->
      ("WITH piicl AS (SELECT doc_id, CASE WHEN doc_id % 6 = 0 THEN " +
        "' 555-' || lpad(CAST(doc_id % 97 AS VARCHAR), 4, '0') || " +
        "', 555-' || lpad(CAST(doc_id % 89 AS VARCHAR), 4, '0') || " +
        "'; 555-' || lpad(CAST(doc_id % 97 AS VARCHAR), 4, '0') " +
        "ELSE '' END AS cl FROM documents), " +
        "piiex AS (SELECT doc_id, list_sort(list_distinct(list_filter(" +
        "list_transform(string_split_regex(replace(cl, ' ', ''), " +
        "'[,;/]+'), x -> trim(x)), x -> x <> ''))) AS ph FROM piicl) " +
        "SELECT doc_id, CAST(len(ph) AS BIGINT) AS n_phones, " +
        "array_to_string(ph, ',') AS phones " +
        "FROM piiex WHERE len(ph) > 0 ORDER BY doc_id"),
    "q347_pii_props_audit" ->
      ("WITH piiev AS (SELECT event_type, user_id, " +
        "len(regexp_extract_all(props || CASE WHEN event_id % 13 = 0 " +
        "THEN ' user' || user_id || '@mail.test' ELSE '' END, " +
        s"'$piiEmailRe')) AS n_email FROM events) " +
        "SELECT event_type, COUNT(*) AS n_events, " +
        "CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_with_contact, " +
        "COUNT(DISTINCT CASE WHEN n_email > 0 THEN user_id END) " +
        "AS n_users_exposed " +
        "FROM piiev GROUP BY event_type ORDER BY event_type"),
    "q348_pii_redacted_copy" ->
      (s"WITH $piiPlantCte, " +
        "piired AS (SELECT doc_id, source, " +
        s"CAST(len(regexp_extract_all(raw, '$piiEmailRe')) + " +
        s"len(regexp_extract_all(raw, '$piiPhoneRe')) + " +
        s"len(regexp_extract_all(raw, '$piiIpRe')) AS BIGINT) " +
        "AS n_redactions, " +
        "regexp_replace(regexp_replace(regexp_replace(raw, " +
        s"'$piiEmailRe', '<EMAIL>', 'g'), " +
        s"'$piiPhoneRe', '<PHONE>', 'g'), " +
        s"'$piiIpRe', '<IP>', 'g') AS clean FROM piidocs) " +
        "SELECT source, COUNT(*) AS n_docs, " +
        "CAST(SUM(n_redactions) AS BIGINT) AS n_redactions, " +
        "CAST(SUM(length(clean)) AS BIGINT) AS n_chars_clean, " +
        "MIN(md5(clean)) AS content_md5_min, " +
        "MAX(md5(clean)) AS content_md5_max " +
        "FROM piired GROUP BY source ORDER BY source"),
    // q345 per micro-batch — (source, kind) cells sum-merge; shares
    // q345's oracle verbatim
    "q349_streaming_pii_incidence" -> piiIncidenceSql,
    // q151: full-vector tf-idf cosine — q67's weighting, doc norm over
    // ALL the doc's terms, fixed-point-rounded selection (q130's trick)
    "q151_tfidf_cosine_topk" ->
      ("WITH t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
        "nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM t), " +
        "tf AS (SELECT doc_id, tok AS term, CAST(COUNT(*) AS BIGINT) AS cnt " +
        "FROM (SELECT doc_id, unnest(toks) AS tok FROM t) u GROUP BY 1, 2), " +
        "w AS (SELECT tf.doc_id, tf.term, " +
        "(CAST(cnt AS DOUBLE) / SUM(CAST(cnt AS DOUBLE)) OVER " +
        "(PARTITION BY tf.doc_id)) * " +
        "ln(nd.n_docs / CAST(COUNT(*) OVER (PARTITION BY tf.term) AS DOUBLE)) " +
        "AS w FROM tf CROSS JOIN nd), " +
        "normd AS (SELECT doc_id, sqrt(SUM(w * w)) AS norm_d FROM w GROUP BY 1), " +
        "qterms AS (SELECT * FROM (VALUES ('spark'), ('join'), ('stream')) " +
        "v(term)), " +
        "qdf AS (SELECT tf.term, " +
        "CAST(COUNT(DISTINCT tf.doc_id) AS DOUBLE) AS df " +
        "FROM tf JOIN qterms ON tf.term = qterms.term GROUP BY 1), " +
        "qw AS (SELECT term, (1.0 / 3.0) * ln(nd.n_docs / df) AS qw " +
        "FROM qdf CROSS JOIN nd), " +
        "qn AS (SELECT sqrt(SUM(qw * qw)) AS norm_q FROM qw), " +
        "sc AS (SELECT w.doc_id, SUM(w.w * qw.qw) AS dot " +
        "FROM w JOIN qw ON w.term = qw.term GROUP BY 1), " +
        "r AS (SELECT sc.doc_id AS doc_id, " +
        "sc.dot / (normd.norm_d * qn.norm_q) AS score " +
        "FROM sc JOIN normd ON sc.doc_id = normd.doc_id CROSS JOIN qn " +
        "ORDER BY CAST(floor(score * 1e9 + 0.5) AS BIGINT) DESC, sc.doc_id " +
        "LIMIT 15) " +
        "SELECT doc_id, score FROM r ORDER BY doc_id"),
    // q152: per-language fertility of the trained q131 BPE (the q134
    // vocab chain, aggregated by lang with char counts)
    "q152_tokenizer_fertility" ->
      ("WITH words AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq " +
        "FROM (SELECT unnest(list_filter(string_split_regex(text, " +
        "'\\s+'), x -> x <> '')) AS w FROM documents) GROUP BY w), " +
        "s0 AS (SELECT w, freq, CAST(u.p AS BIGINT) AS pos, " +
        "substr(w, CAST(u.p + 1 AS INT), 1) AS sym " +
        "FROM words, unnest(range(len(w))) u(p)), " +
        bpeRound("s0", 1) + ", " +
        bpeRound("s1", 2) + ", " +
        bpeRound("s2", 3) + ", " +
        "vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_syms " +
        "FROM s3 GROUP BY w), " +
        "tok AS (SELECT lang, " +
        "unnest(list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '')) AS w FROM documents) " +
        "SELECT tok.lang, CAST(COUNT(*) AS BIGINT) AS n_words, " +
        "CAST(SUM(len(tok.w)) AS BIGINT) AS n_chars, " +
        "CAST(SUM(vocab.n_syms) AS BIGINT) AS n_tokens, " +
        "CAST(SUM(vocab.n_syms) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) " +
        "AS tokens_per_word, " +
        "CAST(SUM(len(tok.w)) AS DOUBLE) / CAST(SUM(vocab.n_syms) AS DOUBLE) " +
        "AS chars_per_token " +
        "FROM tok JOIN vocab USING (w) GROUP BY tok.lang " +
        "ORDER BY tok.lang"),
    // q153: per-held-out-split distinct-3-shingle overlap vs train
    // (q136's split byte rule, q95's shingle spelling)
    "q153_split_leakage_audit" ->
      ("WITH t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks, md5('split|' || CAST(doc_id AS VARCHAR)) AS hk " +
        "FROM documents), " +
        "sp AS (SELECT doc_id, toks, CASE WHEN " +
        "(strpos('0123456789abcdef', substr(hk, 1, 1)) - 1) * 16 + " +
        "strpos('0123456789abcdef', substr(hk, 2, 1)) - 1 < 204 " +
        "THEN 'train' WHEN " +
        "(strpos('0123456789abcdef', substr(hk, 1, 1)) - 1) * 16 + " +
        "strpos('0123456789abcdef', substr(hk, 2, 1)) - 1 < 230 " +
        "THEN 'val' ELSE 'test' END AS split FROM t), " +
        "g AS (SELECT DISTINCT split, substr(md5(unnest(list_distinct(" +
        "list_transform(range(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])))), 1, 16) " +
        "AS g FROM sp), " +
        "tr AS (SELECT g AS tg FROM g WHERE split = 'train') " +
        "SELECT g.split, CAST(COUNT(*) AS BIGINT) AS n_grams, " +
        "CAST(SUM(CASE WHEN tr.tg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_overlap, " +
        "CAST(SUM(CASE WHEN tr.tg IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / " +
        "CAST(COUNT(*) AS DOUBLE) AS overlap_ratio " +
        "FROM g LEFT JOIN tr ON g.g = tr.tg WHERE g.split <> 'train' " +
        "GROUP BY g.split ORDER BY g.split"),
    // q155: per-source volume / exact-dup rate (corpus-wide
    // first-occurrence rule) / language spread / mean length
    "q155_source_report" ->
      ("WITH d AS (SELECT doc_id, source, lang, n_chars, md5(text) AS h " +
        "FROM documents), " +
        "fs AS (SELECT h, MIN(doc_id) AS first_id FROM d GROUP BY h) " +
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(CASE WHEN d.doc_id <> fs.first_id THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_dups, " +
        "CAST(SUM(CASE WHEN d.doc_id <> fs.first_id THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dup_ratio, " +
        "CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs, " +
        "CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) " +
        "AS avg_chars " +
        "FROM d JOIN fs USING (h) GROUP BY source ORDER BY source"),
    // q156: q140's train-split LM scoring the WHOLE corpus, bucketed
    // head/middle/tail by integer rank terciles (3*rk <= n / <= 2n)
    "q156_perplexity_buckets" ->
      ("WITH t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
        "f AS (SELECT t.*, CASE WHEN bb < 204 THEN 'train' " +
        "WHEN bb < 230 THEN 'val' ELSE 'test' END AS split FROM " +
        "(SELECT *, (strpos('0123456789abcdef', substr(md5('split|' " +
        "|| CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 + " +
        "strpos('0123456789abcdef', substr(md5('split|' || " +
        "CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS bb FROM t) t " +
        "WHERE len(toks) >= 2), " +
        "bg AS (SELECT doc_id, split, toks[CAST(p AS INT)] AS w1, " +
        "toks[CAST(p + 1 AS INT)] AS w2 " +
        "FROM f, unnest(range(1, len(toks))) u(p)), " +
        "db AS (SELECT doc_id, w1, w2, COUNT(*) AS cnt " +
        "FROM bg GROUP BY 1, 2, 3), " +
        "c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 " +
        "FROM bg WHERE split = 'train' GROUP BY 1, 2), " +
        "c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 " +
        "FROM c2 GROUP BY 1), " +
        "vv AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM " +
        "(SELECT unnest(toks) AS tok FROM f WHERE split = 'train')), " +
        "sc AS (SELECT db.doc_id, " +
        "CAST(SUM(db.cnt) AS BIGINT) AS n_bigrams, " +
        "SUM(CAST(db.cnt AS DOUBLE) * " +
        "ln((CAST(COALESCE(c2.c2, 0) AS DOUBLE) + 1.0) / " +
        "(CAST(COALESCE(c1.c1, 0) AS DOUBLE) + CAST(vv.v AS DOUBLE)))) / " +
        "CAST(SUM(db.cnt) AS DOUBLE) AS avg_logprob " +
        "FROM db LEFT JOIN c2 ON db.w1 = c2.w1 AND db.w2 = c2.w2 " +
        "LEFT JOIN c1 ON db.w1 = c1.w1 CROSS JOIN vv " +
        "GROUP BY db.doc_id), " +
        "r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY " +
        "CAST(floor(avg_logprob * 1e9 + 0.5) AS BIGINT) DESC, doc_id) " +
        "AS rk, COUNT(*) OVER () AS n FROM sc) " +
        "SELECT doc_id, n_bigrams, avg_logprob, " +
        "CASE WHEN rk * 3 <= n THEN 'head' " +
        "WHEN rk * 3 <= n * 2 THEN 'middle' ELSE 'tail' END AS bucket " +
        "FROM r ORDER BY doc_id"),
    // q158: per-source unigram KL(source || corpus) — exact counts, no
    // smoothing needed (every source term occurs in the corpus)
    "q158_source_kl_drift" -> q158Sql,
    // q270: q158 per micro-batch (gated (source, term) count ledger)
    // — shares q158's oracle verbatim
    "q270_streaming_kl_drift" -> q158Sql,
    // q335: balanced per-language downsample by the md5 order — the
    // sample itself hash-matches (the q147 KDF discipline)
    "q335_balanced_sample" -> q335Sql,
    // q342: q335 per micro-batch (the (lang, doc, h) index
    // distinct-merges; k and ranks fold at drain) — shares q335's SQL
    "q342_streaming_balanced_sample" -> q335Sql,
    // q336: WOE/IV of the length feature vs the q24 quality flag —
    // +1-smoothed exact rates, two ln calls per bucket
    "q336_woe_iv" -> q336Sql,
    // q337: q336 per micro-batch ((bucket, y) cell ledger) — shares
    // q336's oracle verbatim
    "q337_streaming_woe" -> q336Sql,
    // q330: smoothed log-odds distinctive terms, top-5 per source —
    // exact integer odds inputs, two ln calls (the q158 discipline)
    "q330_distinctive_terms" -> q330Sql,
    // q331: q330 per micro-batch off the q270 (source, term) grain —
    // shares q330's oracle verbatim
    "q331_streaming_distinctive" -> q330Sql,
    // q332: exact pairwise source-vocabulary Jaccard — term-keyed
    // self-join of the distinct (source, term) relation
    "q332_vocab_jaccard" -> q332Sql,
    // q333: q332 per micro-batch (distinct at drain over the count
    // state) — shares q332's oracle verbatim
    "q333_streaming_vocab_jaccard" -> q332Sql,
    // q305: per-source bigram conditional entropy H(next|prev) +
    // perplexity — exact (source, w1, w2) counts, one ln per pair row
    // (the q173/q158 fold-order discipline)
    "q305_bigram_entropy_rate" -> q305Sql,
    // q306: q305 per micro-batch (gated bigram count ledger) — shares
    // q305's oracle verbatim
    "q306_streaming_bigram_entropy" -> q305Sql,
    // q307: per-source Simpson/HHI — exact Σc (BIGINT) and Σc²
    // (HUGEINT; the engine uses decimal(38,0)), one division per col
    "q307_simpson_diversity" -> q307Sql,
    // q308: q307 per micro-batch off the same (source, term) grain as
    // q270 — shares q307's oracle verbatim
    "q308_streaming_simpson" -> q307Sql,
    // q309: the q25 guesser's confusion matrix against the lang label
    "q309_langid_confusion" -> q309Sql,
    // q313: q309 per micro-batch ((lang, guess) cell ledger) —
    // shares q309's oracle verbatim
    "q313_streaming_langid_confusion" -> q309Sql,
    // q159: train-split trigram LM with stupid backoff scoring the
    // held-out docs; 0.4 * 0.4 spelled as the same IEEE multiply
    "q159_trigram_backoff_score" ->
      ("WITH t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
        "f AS (SELECT t.*, CASE WHEN bb < 204 THEN 'train' " +
        "WHEN bb < 230 THEN 'val' ELSE 'test' END AS split FROM " +
        "(SELECT *, (strpos('0123456789abcdef', substr(md5('split|' " +
        "|| CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 + " +
        "strpos('0123456789abcdef', substr(md5('split|' || " +
        "CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS bb FROM t) t " +
        "WHERE len(toks) >= 3), " +
        "tg AS (SELECT doc_id, split, toks[CAST(p AS INT)] AS w1, " +
        "toks[CAST(p + 1 AS INT)] AS w2, toks[CAST(p + 2 AS INT)] AS w3 " +
        "FROM f, unnest(range(1, len(toks) - 1)) u(p)), " +
        "bgt AS (SELECT toks[CAST(p AS INT)] AS wa, " +
        "toks[CAST(p + 1 AS INT)] AS wb " +
        "FROM f, unnest(range(1, len(toks))) u(p) " +
        "WHERE split = 'train'), " +
        "c3g AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c123 " +
        "FROM tg WHERE split = 'train' GROUP BY 1, 2, 3), " +
        "cb AS (SELECT wa, wb, CAST(COUNT(*) AS BIGINT) AS cb " +
        "FROM bgt GROUP BY 1, 2), " +
        "cu AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu FROM " +
        "(SELECT unnest(toks) AS tok FROM f WHERE split = 'train') " +
        "GROUP BY 1), " +
        "nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM " +
        "(SELECT unnest(toks) AS tok FROM f WHERE split = 'train')), " +
        "db AS (SELECT doc_id, w1, w2, w3, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM tg " +
        "WHERE split <> 'train' GROUP BY 1, 2, 3, 4), " +
        "sc AS (SELECT db.*, CASE " +
        "WHEN c3g.c123 IS NOT NULL THEN " +
        "ln(CAST(c3g.c123 AS DOUBLE) / CAST(b12.cb AS DOUBLE)) " +
        "WHEN b23.cb IS NOT NULL THEN " +
        "ln(0.4 * CAST(b23.cb AS DOUBLE) / CAST(u2.cu AS DOUBLE)) " +
        "ELSE ln(0.4 * 0.4 * (CAST(COALESCE(u3.cu, 0) AS DOUBLE) + 1.0) / " +
        "(CAST(nv.n AS DOUBLE) + CAST(nv.v AS DOUBLE))) END AS lp " +
        "FROM db LEFT JOIN c3g ON db.w1 = c3g.w1 AND db.w2 = c3g.w2 " +
        "AND db.w3 = c3g.w3 " +
        "LEFT JOIN cb b12 ON db.w1 = b12.wa AND db.w2 = b12.wb " +
        "LEFT JOIN cb b23 ON db.w2 = b23.wa AND db.w3 = b23.wb " +
        "LEFT JOIN cu u2 ON db.w2 = u2.tok " +
        "LEFT JOIN cu u3 ON db.w3 = u3.tok CROSS JOIN nv) " +
        "SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_trigrams, " +
        "SUM(CAST(cnt AS DOUBLE) * lp) / CAST(SUM(cnt) AS DOUBLE) " +
        "AS avg_logprob FROM sc GROUP BY doc_id ORDER BY doc_id"),
    // q162: per-(split, lang) dataset-card mix table — exact counts,
    // shares within split
    "q162_mix_manifest" ->
      ("WITH t AS (SELECT doc_id, lang, " +
        "CAST(len(list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '')) AS BIGINT) AS n_toks, " +
        "md5('split|' || CAST(doc_id AS VARCHAR)) AS hk FROM documents), " +
        "sp AS (SELECT lang, n_toks, CASE WHEN " +
        "(strpos('0123456789abcdef', substr(hk, 1, 1)) - 1) * 16 + " +
        "strpos('0123456789abcdef', substr(hk, 2, 1)) - 1 < 204 " +
        "THEN 'train' WHEN " +
        "(strpos('0123456789abcdef', substr(hk, 1, 1)) - 1) * 16 + " +
        "strpos('0123456789abcdef', substr(hk, 2, 1)) - 1 < 230 " +
        "THEN 'val' ELSE 'test' END AS split FROM t), " +
        "g AS (SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n_toks) AS BIGINT) AS n_tokens FROM sp GROUP BY 1, 2) " +
        "SELECT split, lang, n_docs, n_tokens, " +
        "CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER " +
        "(PARTITION BY split) AS DOUBLE) AS doc_share, " +
        "CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER " +
        "(PARTITION BY split) AS DOUBLE) AS token_share " +
        "FROM g ORDER BY split, lang"),
    // q164: exact-token blocklist screen with hit tolerance
    "q164_blocklist_filter" ->
      ("WITH t AS (SELECT doc_id, lang, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents) " +
        "SELECT doc_id, lang, " +
        "CAST(len(list_filter(toks, x -> x = 'error' OR x = 'null' " +
        "OR x = 'lorem')) AS BIGINT) AS n_hits, " +
        "CAST(len(list_intersect(list_distinct(toks), " +
        "['error', 'null', 'lorem'])) AS BIGINT) AS n_distinct, " +
        "CAST(CASE WHEN len(list_filter(toks, x -> x = 'error' " +
        "OR x = 'null' OR x = 'lorem')) >= 2 THEN 1 ELSE 0 END " +
        "AS BIGINT) AS flagged " +
        "FROM t ORDER BY doc_id"),
    // q178: concat-and-chop sequence packing over the q101 shard order —
    // per-shard cumulative offsets, doc→sequence span explode, exact
    // per-sequence fill/composition
    "q178_packed_sequences" ->
      ("WITH d AS (SELECT doc_id, CAST(len(list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n, " +
        "md5(CAST(doc_id AS VARCHAR)) AS hk FROM documents), " +
        "o AS (SELECT substr(hk, 1, 1) AS shard, doc_id, n, hk, " +
        "CAST(COALESCE(SUM(n) OVER (PARTITION BY substr(hk, 1, 1) " +
        "ORDER BY hk, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) " +
        "AS off FROM d), " +
        "f AS (SELECT * FROM o WHERE n > 0), " +
        "tot AS (SELECT shard, SUM(n) AS shard_tokens FROM f GROUP BY shard), " +
        "e AS (SELECT shard, off // 64 AS first_seq, " +
        "unnest(range(off // 64, (off + n - 1) // 64 + 1)) AS seq_id FROM f), " +
        "g AS (SELECT shard, seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(CASE WHEN first_seq = seq_id THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_starts FROM e GROUP BY shard, seq_id) " +
        "SELECT shard, CAST(g.seq_id AS BIGINT) AS seq_id, g.n_docs, " +
        "g.n_starts, " +
        "CAST(least(64, tot.shard_tokens - g.seq_id * 64) AS BIGINT) " +
        "AS n_tokens " +
        "FROM g JOIN tot USING (shard) ORDER BY shard, seq_id"),
    // q179: overlapping chunk explode (C=20, S=10) — start/length exact,
    // chunk text pinned by md5 of the space-joined window
    "q179_doc_chunking" ->
      ("WITH t AS (SELECT doc_id, list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '') AS toks " +
        "FROM documents), " +
        "f AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n " +
        "FROM t WHERE len(toks) > 0), " +
        "e AS (SELECT doc_id, toks, n, unnest(range(0, n, 10)) AS start " +
        "FROM f) " +
        "SELECT doc_id, CAST(start // 10 AS BIGINT) AS chunk_idx, " +
        "CAST(start AS BIGINT) AS start, " +
        "CAST(least(20, n - start) AS BIGINT) AS n_chunk_tokens, " +
        "md5(array_to_string(toks[start + 1 : start + 20], ' ')) " +
        "AS chunk_md5 " +
        "FROM e ORDER BY doc_id, chunk_idx"),
    // q180: DSIR importance selection — add-one unigram LMs (target =
    // src0 vs the raw pool) over the joint vocab; per-doc mean
    // log-likelihood ratio; top-100 on the fixed-point-rounded key
    "q180_dsir_weights" ->
      ("WITH tok AS (SELECT doc_id, source, unnest(list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '')) AS token " +
        "FROM documents), " +
        "c AS (SELECT token, " +
        "CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS tf_t, " +
        "CAST(SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS tf_r FROM tok GROUP BY token), " +
        "tt AS (SELECT SUM(tf_t) AS tt, SUM(tf_r) AS tr, " +
        "CAST(COUNT(*) AS BIGINT) AS v FROM c), " +
        "lm AS (SELECT token, " +
        "ln(CAST(tf_t + 1 AS DOUBLE) / CAST(tt.tt + tt.v AS DOUBLE)) - " +
        "ln(CAST(tf_r + 1 AS DOUBLE) / CAST(tt.tr + tt.v AS DOUBLE)) AS lw " +
        "FROM c CROSS JOIN tt), " +
        "s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, " +
        "SUM(lw) AS sm FROM tok JOIN lm USING (token) " +
        "WHERE source <> 'src0' GROUP BY doc_id), " +
        "sc AS (SELECT doc_id, n_tokens, " +
        "sm / CAST(n_tokens AS DOUBLE) AS score FROM s), " +
        "r AS (SELECT doc_id, n_tokens, score, " +
        "CAST(ROW_NUMBER() OVER (ORDER BY " +
        "CAST(floor(score * 1e9 + 0.5) AS BIGINT) DESC, doc_id) AS BIGINT) " +
        "AS rk FROM sc) " +
        "SELECT rk, doc_id, n_tokens, score FROM r WHERE rk <= 100 " +
        "ORDER BY rk"),
    // q184: Count-Min 4×256 grid over the vocab — md5-nibble cells, so
    // grid, estimates and overcounts hash-match exactly cross-engine
    "q184_count_min_sketch" -> q184Sql,
    // q310: q184 per micro-batch (global (token, tf) ledger; the grid
    // rebuilds from the exact grain at drain) — shares q184's oracle
    "q310_streaming_count_min" -> q184Sql,
    // q185: q80's screen with a streamed train side — fixed eval side
    // makes the drained result batch-split-invariant
    "q185_streaming_decontamination" -> q80Sql,
    // q188: CUBE(source, lang) — GROUPING bitmask (first arg = MSB,
    // same as Spark's grouping_id) distinguishes the levels; '(all)'
    // stands in for aggregated-away keys so NULL ordering never plays
    "q188_mix_cube" ->
      ("WITH d AS (SELECT source, lang, CAST(len(list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS nt " +
        "FROM documents) " +
        "SELECT CAST(GROUPING(source, lang) AS BIGINT) AS gid, " +
        "COALESCE(source, '(all)') AS source, " +
        "COALESCE(lang, '(all)') AS lang, " +
        "CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(nt) AS BIGINT) AS n_tokens " +
        "FROM d GROUP BY CUBE(source, lang) " +
        "ORDER BY gid, source, lang"),
    // q190: closed-form least squares of ln(tf) on ln(rank) over the
    // ranked vocab — formula spelled identically to the Spark side
    "q190_zipf_fit" -> q190Sql,
    // q311: q190 per micro-batch off the same (token, tf) grain as
    // q310 — shares q190's oracle verbatim
    "q311_streaming_zipf" -> q190Sql,
    // q192: exact KS statistic per source — CDFs are ratios of exact
    // counts over the length histogram, argmax at the smallest length
    "q192_length_ks_drift" ->
      ("WITH d AS (SELECT source, n_chars FROM documents), " +
        "hist AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) " +
        "AS cnt FROM d GROUP BY 1, 2), " +
        "vals AS (SELECT DISTINCT n_chars AS v FROM d), " +
        "sc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM d " +
        "GROUP BY source), " +
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM d), " +
        "grid AS (SELECT sc.source, sc.n_s, vals.v, " +
        "COALESCE(hist.cnt, 0) AS cnt FROM sc CROSS JOIN vals " +
        "LEFT JOIN hist ON hist.source = sc.source AND hist.v = vals.v), " +
        "g2 AS (SELECT source, n_s, v, CAST(SUM(cnt) OVER " +
        "(PARTITION BY source ORDER BY v) AS BIGINT) AS cum_s FROM grid), " +
        "alltab AS (SELECT v, CAST(SUM(cnt_all) OVER (ORDER BY v) AS BIGINT) " +
        "AS cum_all FROM (SELECT n_chars AS v, COUNT(*) AS cnt_all FROM d " +
        "GROUP BY 1)), " +
        "c AS (SELECT g2.source, g2.n_s, g2.v, " +
        "CAST(g2.cum_s AS DOUBLE) / CAST(g2.n_s AS DOUBLE) AS cdf_s, " +
        "CAST(alltab.cum_all - g2.cum_s AS DOUBLE) / " +
        "CAST(tot.n_all - g2.n_s AS DOUBLE) AS cdf_r " +
        "FROM g2 JOIN alltab USING (v) CROSS JOIN tot), " +
        "k AS (SELECT source, n_s, abs(cdf_s - cdf_r) AS diff, v, " +
        "ROW_NUMBER() OVER (PARTITION BY source " +
        "ORDER BY abs(cdf_s - cdf_r) DESC, v) AS rn FROM c) " +
        "SELECT source, n_s, diff AS ks, CAST(v AS BIGINT) AS at_chars " +
        "FROM k WHERE rn = 1 ORDER BY source"),
    // q199: the q147 A-ES KDF with a 'gws|' salt and a per-source
    // partitioned fixed-point rank — stratified k-per-source draw
    "q199_grouped_weighted_sample" ->
      ("WITH m0 AS (SELECT doc_id, source, n_chars, " +
        "md5('gws|' || CAST(doc_id AS VARCHAR)) AS m FROM documents " +
        "WHERE n_chars > 0), " +
        "kdf AS (SELECT doc_id, source, n_chars, " +
        "ln((CAST(" +
        "(strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 17592186044416 + " +
        "(strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 1099511627776 + " +
        "(strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 68719476736 + " +
        "(strpos('0123456789abcdef', substr(m, 4, 1)) - 1) * 4294967296 + " +
        "(strpos('0123456789abcdef', substr(m, 5, 1)) - 1) * 268435456 + " +
        "(strpos('0123456789abcdef', substr(m, 6, 1)) - 1) * 16777216 + " +
        "(strpos('0123456789abcdef', substr(m, 7, 1)) - 1) * 1048576 + " +
        "(strpos('0123456789abcdef', substr(m, 8, 1)) - 1) * 65536 + " +
        "(strpos('0123456789abcdef', substr(m, 9, 1)) - 1) * 4096 + " +
        "(strpos('0123456789abcdef', substr(m, 10, 1)) - 1) * 256 + " +
        "(strpos('0123456789abcdef', substr(m, 11, 1)) - 1) * 16 + " +
        "(strpos('0123456789abcdef', substr(m, 12, 1)) - 1) * 1 " +
        "AS DOUBLE) + 0.5) / 281474976710656.0) / CAST(n_chars AS DOUBLE) " +
        "AS es_key FROM m0), " +
        "r AS (SELECT source, doc_id, n_chars, es_key, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY " +
        "CAST(floor(es_key * 1e9 + 0.5) AS BIGINT) DESC, doc_id) AS BIGINT) " +
        "AS rk FROM kdf) " +
        "SELECT source, rk, doc_id, n_chars, es_key FROM r " +
        "WHERE rk <= 10 ORDER BY source, rk"),
    // q200: exact per-source deciles — the observed value at rank
    // ceil(d·n/10); pure integer-rank selection, zero FP tolerance
    "q200_source_deciles" -> q200Sql,
    // q263: q200 per micro-batch (gated value-histogram ledger) —
    // shares q200's oracle verbatim
    "q263_streaming_deciles" -> q200Sql,
    // q195: set overlap of the q130 (BM25) and q151 (TF-IDF cosine)
    // top-15 sets — both chains inlined with bm_/ti_ prefixes, each
    // spelled exactly as its own oracle entry
    "q195_ranker_agreement" ->
      ("WITH t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
        "qterms AS (SELECT * FROM (VALUES ('spark'), ('join'), ('stream')) " +
        "v(term)), " +
        "bm_stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, " +
        "AVG(CAST(len(toks) AS DOUBLE)) AS avgdl FROM t), " +
        "bm_tf AS (SELECT doc_id, tok AS term, " +
        "CAST(COUNT(*) AS BIGINT) AS tf " +
        "FROM (SELECT doc_id, unnest(toks) AS tok FROM t) u " +
        "JOIN qterms ON u.tok = qterms.term GROUP BY 1, 2), " +
        "bm_df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) " +
        "AS df FROM bm_tf GROUP BY 1), " +
        "bm_dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM t), " +
        "bm_sc AS (SELECT bm_tf.doc_id, " +
        "SUM(ln(1.0 + (bm_stats.n - bm_df.df + 0.5) / (bm_df.df + 0.5)) " +
        "* CAST(bm_tf.tf AS DOUBLE) * 2.2 " +
        "/ (CAST(bm_tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * bm_dl.dl / " +
        "bm_stats.avgdl))) AS score " +
        "FROM bm_tf JOIN bm_df USING (term) JOIN bm_dl USING (doc_id) " +
        "CROSS JOIN bm_stats GROUP BY 1), " +
        "bm_sel AS (SELECT doc_id FROM (" +
        "SELECT doc_id, ROW_NUMBER() OVER (ORDER BY " +
        "CAST(floor(score * 1e9 + 0.5) AS BIGINT) DESC, doc_id) AS rk " +
        "FROM bm_sc) WHERE rk <= 15), " +
        "ti_nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM t), " +
        "ti_tf AS (SELECT doc_id, tok AS term, CAST(COUNT(*) AS BIGINT) AS cnt " +
        "FROM (SELECT doc_id, unnest(toks) AS tok FROM t) u GROUP BY 1, 2), " +
        "ti_w AS (SELECT ti_tf.doc_id, ti_tf.term, " +
        "(CAST(cnt AS DOUBLE) / SUM(CAST(cnt AS DOUBLE)) OVER " +
        "(PARTITION BY ti_tf.doc_id)) * " +
        "ln(ti_nd.n_docs / CAST(COUNT(*) OVER (PARTITION BY ti_tf.term) AS DOUBLE)) " +
        "AS w FROM ti_tf CROSS JOIN ti_nd), " +
        "ti_normd AS (SELECT doc_id, sqrt(SUM(w * w)) AS norm_d FROM ti_w " +
        "GROUP BY 1), " +
        "ti_qdf AS (SELECT ti_tf.term, " +
        "CAST(COUNT(DISTINCT ti_tf.doc_id) AS DOUBLE) AS df " +
        "FROM ti_tf JOIN qterms ON ti_tf.term = qterms.term GROUP BY 1), " +
        "ti_qw AS (SELECT term, (1.0 / 3.0) * ln(ti_nd.n_docs / df) AS qw " +
        "FROM ti_qdf CROSS JOIN ti_nd), " +
        "ti_qn AS (SELECT sqrt(SUM(qw * qw)) AS norm_q FROM ti_qw), " +
        "ti_sc AS (SELECT ti_w.doc_id, SUM(ti_w.w * ti_qw.qw) AS dot " +
        "FROM ti_w JOIN ti_qw ON ti_w.term = ti_qw.term GROUP BY 1), " +
        "ti_sel AS (SELECT sc2.doc_id FROM (" +
        "SELECT ti_sc.doc_id, " +
        "ti_sc.dot / (ti_normd.norm_d * ti_qn.norm_q) AS score " +
        "FROM ti_sc JOIN ti_normd ON ti_sc.doc_id = ti_normd.doc_id " +
        "CROSS JOIN ti_qn " +
        "ORDER BY CAST(floor(ti_sc.dot / (ti_normd.norm_d * ti_qn.norm_q) " +
        "* 1e9 + 0.5) AS BIGINT) DESC, ti_sc.doc_id LIMIT 15) sc2), " +
        "c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_common " +
        "FROM bm_sel JOIN ti_sel USING (doc_id)), " +
        "nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bm25 FROM bm_sel), " +
        "nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tfidf FROM ti_sel) " +
        "SELECT n_bm25, n_tfidf, n_common, " +
        "CAST(n_bm25 - n_common AS BIGINT) AS n_bm25_only, " +
        "CAST(n_tfidf - n_common AS BIGINT) AS n_tfidf_only, " +
        "CAST(n_common AS DOUBLE) / " +
        "CAST(n_bm25 + n_tfidf - n_common AS DOUBLE) AS overlap_jaccard " +
        "FROM c CROSS JOIN nb CROSS JOIN nt"),
    // q194: top-3 lift tokens per embedding label — lift is a ratio of
    // exact count ratios; fixed-point rank key, lexical tie-break
    "q194_label_lexicon" ->
      ("WITH lab AS (SELECT vec_id AS doc_id, CAST(label AS BIGINT) " +
        "AS label FROM embeddings), " +
        "tok AS (SELECT lab.label, unnest(list_filter(" +
        "string_split_regex(d.text, '\\s+'), x -> x <> '')) AS token " +
        "FROM documents d JOIN lab USING (doc_id)), " +
        "pl AS (SELECT label, token, CAST(COUNT(*) AS BIGINT) AS tf_l " +
        "FROM tok GROUP BY 1, 2), " +
        "pl2 AS (SELECT *, CAST(SUM(tf_l) OVER (PARTITION BY label) " +
        "AS BIGINT) AS n_l FROM pl), " +
        "m AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok " +
        "GROUP BY token), " +
        "tt AS (SELECT CAST(SUM(tf) AS BIGINT) AS n_all FROM m), " +
        "sc AS (SELECT pl2.label, pl2.token, pl2.tf_l, " +
        "(CAST(tf_l AS DOUBLE) / CAST(n_l AS DOUBLE)) / " +
        "(CAST(tf AS DOUBLE) / CAST(n_all AS DOUBLE)) AS lift " +
        "FROM pl2 JOIN m USING (token) CROSS JOIN tt), " +
        "r AS (SELECT label, token, tf_l, lift, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY label ORDER BY " +
        "CAST(floor(lift * 1e9 + 0.5) AS BIGINT) DESC, token) AS BIGINT) " +
        "AS rk FROM sc) " +
        "SELECT label, rk, token, tf_l, lift FROM r WHERE rk <= 3 " +
        "ORDER BY label, rk"),
    // q205: Heaps'-law growth — global token positions from a doc-level
    // prefix sum, vocab measured at the ten exact integer checkpoints,
    // β from the shared log-log regression formula (q190 discipline)
    "q205_heaps_law" -> q205Sql,
    // q314: q205 per micro-batch (order-sensitive first-position
    // min-merge under the arrival contract) — shares q205's oracle
    "q314_streaming_heaps" -> q205Sql,
    // q206: the q171 plan CTE + the exact div/mod epoch split; the
    // partial pass is the greedy md5-order prefix until T mod N tokens
    "q206_epoch_materialization" ->
      ("WITH d0 AS (SELECT source, len(list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '')) AS tc " +
        "FROM documents), " +
        "c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(tc) AS BIGINT) AS n_tokens FROM d0 GROUP BY source), " +
        "tt AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 2 AS b FROM c), " +
        "s AS (SELECT source, n_docs, n_tokens, " +
        "sqrt(CAST(n_tokens AS DOUBLE)) AS w FROM c), " +
        "tot AS (SELECT list_reduce(list(w ORDER BY source), " +
        "(a, b) -> a + b) AS t FROM s), " +
        "p AS (SELECT source, n_docs, n_tokens, " +
        "CAST(floor(CAST(tt.b AS DOUBLE) * w / tot.t) AS BIGINT) " +
        "AS target_tokens FROM s CROSS JOIN tot CROSS JOIN tt), " +
        // n_tokens = 0 (an all-empty source) would hard-error `//`
        // where Spark NULLs — both engines filter it (ADVICE r9)
        "pl AS (SELECT source, n_docs, n_tokens, " +
        "target_tokens // n_tokens AS full_e, " +
        "target_tokens % n_tokens AS ptar FROM p WHERE n_tokens > 0), " +
        "h AS (SELECT source, doc_id, CAST(len(list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) " +
        "AS tc, md5('epoch|' || CAST(doc_id AS VARCHAR)) AS hk " +
        "FROM documents), " +
        "cb AS (SELECT source, doc_id, tc, CAST(COALESCE(SUM(tc) OVER (" +
        "PARTITION BY source ORDER BY hk, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
        "AS BIGINT) AS cum FROM h), " +
        "sel AS (SELECT cb.source, CAST(COUNT(*) AS BIGINT) AS n_sel, " +
        "CAST(SUM(cb.tc) AS BIGINT) AS tok_sel FROM cb " +
        "JOIN pl USING (source) WHERE cb.cum < pl.ptar " +
        "GROUP BY cb.source), " +
        "fulls AS (SELECT source, " +
        "CAST(unnest(range(0, full_e)) AS BIGINT) AS epoch, " +
        "'full' AS kind, n_docs, n_tokens FROM pl WHERE full_e > 0), " +
        "parts AS (SELECT pl.source, CAST(full_e AS BIGINT) AS epoch, " +
        "'partial' AS kind, COALESCE(sel.n_sel, 0) AS n_docs, " +
        "COALESCE(sel.tok_sel, 0) AS n_tokens FROM pl " +
        "LEFT JOIN sel USING (source) WHERE pl.ptar > 0) " +
        "SELECT * FROM (SELECT * FROM fulls " +
        "UNION ALL SELECT * FROM parts) ORDER BY source, epoch"),
    // q211: the home queries' CTEs (q182 quality flag, q209 dup rate +
    // Wilson, q171 plan) joined on source into one snapshot table
    "q211_source_scorecard" ->
      ("WITH t AS (SELECT source, md5(text) AS h, list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '') AS toks " +
        "FROM documents), " +
        "fl AS (SELECT source, h, CAST(len(toks) AS BIGINT) AS tc, " +
        "CAST(len(toks) >= 20 AND " +
        "CAST(len(list_distinct(toks)) AS DOUBLE) / " +
        "CAST(len(toks) AS DOUBLE) > 0.1 AND " +
        "CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS DOUBLE) / " +
        "CAST(len(toks) AS DOUBLE) < 0.5 AS BIGINT) AS flag FROM t), " +
        "c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(tc) AS BIGINT) AS n_tokens, " +
        "CAST(SUM(flag) AS BIGINT) AS n_pass FROM fl GROUP BY source), " +
        "tt AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt FROM c), " +
        "dh AS (SELECT h FROM (SELECT h, COUNT(*) AS cc FROM fl " +
        "GROUP BY h) WHERE cc >= 2), " +
        "ds AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_dup " +
        "FROM fl JOIN dh USING (h) GROUP BY source), " +
        "wi AS (SELECT c.source, " +
        "CAST(COALESCE(ds.n_dup, 0) AS BIGINT) AS n_dup, " +
        "CAST(COALESCE(ds.n_dup, 0) AS DOUBLE) / " +
        "CAST(c.n_docs AS DOUBLE) AS p, " +
        "CAST(c.n_docs AS DOUBLE) AS n FROM c " +
        "LEFT JOIN ds ON ds.source = c.source), " +
        "w2 AS (SELECT source, n_dup, p AS dup_rate, " +
        "greatest(0.0, ((p + 1.96 * 1.96 / (2.0 * n)) / " +
        "(1.0 + 1.96 * 1.96 / n)) - ((1.96 * sqrt((p * (1.0 - p) + " +
        "1.96 * 1.96 / (4.0 * n)) / n)) / (1.0 + 1.96 * 1.96 / n))) " +
        "AS wilson_lo, " +
        "least(1.0, ((p + 1.96 * 1.96 / (2.0 * n)) / " +
        "(1.0 + 1.96 * 1.96 / n)) + ((1.96 * sqrt((p * (1.0 - p) + " +
        "1.96 * 1.96 / (4.0 * n)) / n)) / (1.0 + 1.96 * 1.96 / n))) " +
        "AS wilson_hi FROM wi), " +
        "bt AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 2 AS b FROM c), " +
        "sw AS (SELECT source, n_tokens, " +
        "sqrt(CAST(n_tokens AS DOUBLE)) AS w FROM c), " +
        "swt AS (SELECT list_reduce(list(w ORDER BY source), " +
        "(a, b) -> a + b) AS t FROM sw), " +
        "pp AS (SELECT source, " +
        "CAST(floor(CAST(bt.b AS DOUBLE) * w / swt.t) AS BIGINT) " +
        "AS target_tokens, n_tokens FROM sw " +
        "CROSS JOIN swt CROSS JOIN bt), " +
        "pe AS (SELECT source, CAST(target_tokens AS DOUBLE) / " +
        "CAST(n_tokens AS DOUBLE) AS epochs, " +
        "CAST(CASE WHEN CAST(target_tokens AS DOUBLE) / " +
        "CAST(n_tokens AS DOUBLE) > 1 THEN 1 ELSE 0 END AS BIGINT) " +
        "AS upsampled FROM pp) " +
        "SELECT c.source, c.n_docs, c.n_tokens, " +
        "CAST(c.n_tokens AS DOUBLE) / CAST(tt.tt AS DOUBLE) " +
        "AS token_share, " +
        "CAST(c.n_tokens AS DOUBLE) / CAST(c.n_docs AS DOUBLE) " +
        "AS mean_tokens, " +
        "CAST(c.n_pass AS DOUBLE) / CAST(c.n_docs AS DOUBLE) " +
        "AS accept_rate, " +
        "w2.n_dup, w2.dup_rate, w2.wilson_lo, w2.wilson_hi, " +
        "pe.epochs, pe.upsampled " +
        "FROM c CROSS JOIN tt " +
        "JOIN w2 ON w2.source = c.source " +
        "JOIN pe ON pe.source = c.source ORDER BY c.source"),
    // q216: the decode trajectory unrolled step for step (the q154
    // discipline) — integer-count argmax with lexical tie-break
    "q216_greedy_decode" -> q216Sql,
    // q220: observed vs independence-expected (split, lang) counts —
    // integer numerators, one division per cell
    "q220_split_composition" ->
      ("WITH b AS (SELECT CASE WHEN bb < 204 THEN 'train' " +
        "WHEN bb < 230 THEN 'val' ELSE 'test' END AS split, lang FROM " +
        "(SELECT lang, (strpos('0123456789abcdef', " +
        "substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) " +
        "* 16 + strpos('0123456789abcdef', substr(md5('split|' || " +
        "CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS bb FROM documents)), " +
        "c AS (SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM b GROUP BY 1, 2), " +
        "s AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_split " +
        "FROM b GROUP BY 1), " +
        "l AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang " +
        "FROM b GROUP BY 1), " +
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM b) " +
        "SELECT c.split, c.lang, c.n, " +
        "CAST(s.n_split * l.n_lang AS DOUBLE) / " +
        "CAST(t.n_total AS DOUBLE) AS expected, " +
        "CAST(c.n * t.n_total AS DOUBLE) / " +
        "CAST(s.n_split * l.n_lang AS DOUBLE) - 1.0 AS rel_dev " +
        "FROM c JOIN s USING (split) JOIN l USING (lang) CROSS JOIN t " +
        "ORDER BY c.split, c.lang"),
    // q219: median and MAD by exact rank selection (value at ⌈n/2⌉,
    // the q200 discipline); integer arithmetic until the final share
    "q219_length_mad_outliers" ->
      ("WITH d AS (SELECT source, doc_id, n_chars FROM documents), " +
        "m AS (SELECT source, n_chars AS med FROM " +
        "(SELECT source, n_chars, CAST(ROW_NUMBER() OVER (" +
        "PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) " +
        "AS rk, CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) " +
        "AS n FROM d) WHERE rk = (n + 1) // 2), " +
        "dv AS (SELECT d.source, d.doc_id, m.med, " +
        "abs(d.n_chars - m.med) AS dev FROM d JOIN m USING (source)), " +
        "md AS (SELECT source, dev AS mad FROM " +
        "(SELECT source, dev, CAST(ROW_NUMBER() OVER (" +
        "PARTITION BY source ORDER BY dev, doc_id) AS BIGINT) AS rk, " +
        "CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n " +
        "FROM dv) WHERE rk = (n + 1) // 2) " +
        "SELECT dv.source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(MIN(dv.med) AS BIGINT) AS median, " +
        "CAST(MIN(md.mad) AS BIGINT) AS mad, " +
        "CAST(SUM(CASE WHEN dv.dev > 3 * md.mad THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_outliers, " +
        "CAST(SUM(CASE WHEN dv.dev > 3 * md.mad THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS outlier_share " +
        "FROM dv JOIN md USING (source) GROUP BY dv.source " +
        "ORDER BY dv.source"),
    // q217: (source, n_copies)-grain soft-dedup weights — one division
    // per output row over integer sums, exact cross-engine
    "q217_dup_aware_weights" ->
      ("WITH h AS (SELECT source, md5(text) AS h, " +
        "len(list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '')) AS tc FROM documents), " +
        "c AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n_copies FROM h " +
        "GROUP BY h), " +
        "j AS (SELECT source, n_copies, " +
        "CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(tc) AS BIGINT) AS n_tokens " +
        "FROM h JOIN c USING (h) GROUP BY 1, 2) " +
        "SELECT source, n_copies, n_docs, n_tokens, " +
        "1.0 / CAST(n_copies AS DOUBLE) AS weight, " +
        "CAST(n_tokens AS DOUBLE) / CAST(n_copies AS DOUBLE) " +
        "AS effective_tokens FROM j ORDER BY source, n_copies"),
    // q218: the q136 chain + the reassignment audit — leaked held-out
    // docs move to train, counts are exact set arithmetic
    "q218_split_leak_repair" ->
      ("WITH a AS (SELECT doc_id, md5(text) AS content_hash, " +
        "md5('split|' || CAST(doc_id AS VARCHAR)) AS hk " +
        "FROM documents), " +
        "b AS (SELECT *, (strpos('0123456789abcdef', " +
        "substr(hk, 1, 1)) - 1) * 16 + " +
        "strpos('0123456789abcdef', substr(hk, 2, 1)) - 1 AS bb " +
        "FROM a), " +
        "sp AS (SELECT doc_id, content_hash, CASE WHEN bb < 204 " +
        "THEN 'train' WHEN bb < 230 THEN 'val' ELSE 'test' END " +
        "AS split FROM b), " +
        "th AS (SELECT DISTINCT content_hash AS t_hash FROM sp " +
        "WHERE split = 'train'), " +
        "s AS (SELECT sp.split, CASE WHEN sp.split <> 'train' AND " +
        "th.t_hash IS NOT NULL THEN 1 ELSE 0 END AS lk FROM sp " +
        "LEFT JOIN th ON sp.content_hash = th.t_hash), " +
        "bf AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_before, " +
        "CAST(SUM(lk) AS BIGINT) AS n_out FROM s GROUP BY split), " +
        "mv AS (SELECT CAST(SUM(lk) AS BIGINT) AS m FROM s) " +
        "SELECT split, n_before, " +
        "CAST(CASE WHEN split = 'train' THEN 0 ELSE n_out END " +
        "AS BIGINT) AS n_moved_out, " +
        "CAST(CASE WHEN split = 'train' THEN mv.m ELSE 0 END " +
        "AS BIGINT) AS n_moved_in, " +
        "CAST(n_before - (CASE WHEN split = 'train' THEN 0 ELSE n_out " +
        "END) + (CASE WHEN split = 'train' THEN mv.m ELSE 0 END) " +
        "AS BIGINT) AS n_after " +
        "FROM bf CROSS JOIN mv ORDER BY split"),
    // q258: per-source deciles from the deterministic 25% md5 sample
    // vs exact — both halves are the q200 rank-selection CTE via one
    // prefix-parameterized builder (the q244 discipline)
    "q258_sampled_deciles" ->
      ("WITH s0 AS (SELECT source, n_chars, doc_id FROM documents " +
        "WHERE (strpos('0123456789abcdef', " +
        "substr(md5('sq|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) " +
        "* 16 + strpos('0123456789abcdef', " +
        "substr(md5('sq|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1 " +
        "< 64), " +
        decileCtes("ex", "documents") + ", " +
        decileCtes("sa", "s0") + " " +
        "SELECT ex_d.source, ex_d.decile, ex_d.value, ex_d.n_docs, " +
        "sa_d.value AS sampled_value, sa_d.n_docs AS n_sampled, " +
        "CASE WHEN sa_d.value IS NOT NULL " +
        "THEN abs(sa_d.value - ex_d.value) END AS abs_err " +
        "FROM ex_d LEFT JOIN sa_d " +
        "ON sa_d.source = ex_d.source AND sa_d.decile = ex_d.decile " +
        "ORDER BY ex_d.source, ex_d.decile"),
    // q264: q258 swept over nested 'sq|' sample rates 1/4, 1/16, 1/64
    // (thresholds 64/16/4 over the first md5 byte) — four decileCtes
    // chains, a denom grid, and a (source × rate) error rollup
    "q264_decile_sample_sweep" ->
      ("WITH " +
        Seq(64 -> "a4", 16 -> "a16", 4 -> "a64").map { case (t, p) =>
          s"s$p AS (SELECT source, n_chars, doc_id FROM documents " +
            "WHERE (strpos('0123456789abcdef', " +
            "substr(md5('sq|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) " +
            "* 16 + strpos('0123456789abcdef', " +
            "substr(md5('sq|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1 " +
            s"< $t)"
        }.mkString(", ") + ", " +
        decileCtes("ex", "documents") + ", " +
        decileCtes("a4", "sa4") + ", " +
        decileCtes("a16", "sa16") + ", " +
        decileCtes("a64", "sa64") + ", " +
        "dn AS (SELECT unnest([4, 16, 64]) AS denom), " +
        "sw AS (SELECT 4 AS denom, * FROM a4_d " +
        "UNION ALL SELECT 16 AS denom, * FROM a16_d " +
        "UNION ALL SELECT 64 AS denom, * FROM a64_d), " +
        "j AS (SELECT ex_d.source, dn.denom, ex_d.decile, " +
        "ex_d.value, ex_d.n_docs, sw.value AS sv, sw.n_docs AS ns " +
        "FROM ex_d CROSS JOIN dn LEFT JOIN sw ON sw.denom = dn.denom " +
        "AND sw.source = ex_d.source AND sw.decile = ex_d.decile) " +
        "SELECT source, CAST(denom AS BIGINT) AS denom, " +
        "MAX(n_docs) AS n_docs, MAX(ns) AS n_sampled, " +
        "CAST(SUM(CASE WHEN sv IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_missing, " +
        "MAX(abs(sv - value)) AS max_abs_err, " +
        "AVG(abs(sv - value)) AS mean_abs_err " +
        "FROM j GROUP BY 1, 2 ORDER BY source, denom"),
  )

  private def q158Sql: String =
    ("WITH tok AS (SELECT source, " +
      "unnest(list_filter(string_split_regex(text, '\\s+'), " +
      "x -> x <> '')) AS term FROM documents), " +
      "c AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt " +
      "FROM tok GROUP BY 1, 2), " +
      "st AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS s_total " +
      "FROM c GROUP BY 1), " +
      "cc AS (SELECT term, CAST(SUM(cnt) AS BIGINT) AS c_cnt " +
      "FROM c GROUP BY 1), " +
      "ct AS (SELECT CAST(SUM(c_cnt) AS BIGINT) AS c_total FROM cc) " +
      "SELECT c.source, MAX(st.s_total) AS n_tokens, " +
      "CAST(COUNT(*) AS BIGINT) AS n_terms, " +
      "SUM((CAST(c.cnt AS DOUBLE) / CAST(st.s_total AS DOUBLE)) * " +
      "ln((CAST(c.cnt AS DOUBLE) / CAST(st.s_total AS DOUBLE)) / " +
      "(CAST(cc.c_cnt AS DOUBLE) / CAST(ct.c_total AS DOUBLE)))) AS kl " +
      "FROM c JOIN st USING (source) JOIN cc USING (term) CROSS JOIN ct " +
      "GROUP BY c.source ORDER BY c.source")


  private def q173Sql: String =
    ("WITH t AS (SELECT lang, unnest(list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '')) AS token " +
        "FROM documents), " +
        "tf AS (SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS tf " +
        "FROM t GROUP BY 1, 2), " +
        "tot AS (SELECT lang, CAST(SUM(tf) AS BIGINT) AS n_tokens, " +
        "CAST(COUNT(*) AS BIGINT) AS n_types FROM tf GROUP BY lang), " +
        "e AS (SELECT tf.lang, " +
        "-SUM((CAST(tf AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * " +
        "ln(CAST(tf AS DOUBLE) / CAST(n_tokens AS DOUBLE))) AS entropy " +
        "FROM tf JOIN tot USING (lang) GROUP BY tf.lang) " +
        "SELECT e.lang, n_tokens, n_types, entropy, " +
        "exp(entropy) AS perplexity FROM e JOIN tot ON e.lang = tot.lang " +
        "ORDER BY e.lang")

  private def q309Sql: String =
    ("WITH t AS (SELECT lang, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
        "g AS (SELECT lang, CASE " +
        "WHEN len(list_filter(toks, x -> x = 'the')) >= 3 THEN 'en' " +
        "WHEN len(list_filter(toks, x -> x = 'data')) >= 3 THEN 'de' " +
        "WHEN len(list_filter(toks, x -> x = 'table')) >= 3 THEN 'es' " +
        "ELSE 'und' END AS lang_guess FROM t), " +
        "c AS (SELECT lang, lang_guess, CAST(COUNT(*) AS BIGINT) " +
        "AS n_docs FROM g GROUP BY 1, 2), " +
        "lt AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS lang_total " +
        "FROM c GROUP BY 1) " +
        "SELECT c.lang, c.lang_guess, c.n_docs, lt.lang_total, " +
        "CAST(c.n_docs AS DOUBLE) / CAST(lt.lang_total AS DOUBLE) " +
        "AS share FROM c JOIN lt USING (lang) " +
        "ORDER BY c.lang, c.lang_guess")

  private def q184Sql: String =
    ("WITH tok AS (SELECT unnest(list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '')) AS token " +
        "FROM documents), " +
        "tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok " +
        "GROUP BY token), " +
        "cells AS (SELECT token, tf, r.range AS row, " +
        "(strpos('0123456789abcdef', substr(md5('cm' || " +
        "CAST(r.range AS VARCHAR) || '|' || token), 1, 1)) - 1) * 16 + " +
        "(strpos('0123456789abcdef', substr(md5('cm' || " +
        "CAST(r.range AS VARCHAR) || '|' || token), 2, 1)) - 1) AS cell " +
        "FROM tf CROSS JOIN range(0, 4) r), " +
        "grid AS (SELECT row, cell, SUM(tf) AS cell_count FROM cells " +
        "GROUP BY row, cell), " +
        "est AS (SELECT token, MIN(cell_count) AS cm_estimate, " +
        "MIN(tf) AS tf FROM cells JOIN grid USING (row, cell) " +
        "GROUP BY token), " +
        "r2 AS (SELECT token, tf, cm_estimate, " +
        "CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS BIGINT) " +
        "AS rk FROM est) " +
        "SELECT rk, token, CAST(tf AS BIGINT) AS tf, " +
        "CAST(cm_estimate AS BIGINT) AS cm_estimate, " +
        "CAST(cm_estimate - tf AS BIGINT) AS overcount " +
        "FROM r2 WHERE rk <= 20 ORDER BY rk")

  private def q190Sql: String =
    ("WITH t AS (SELECT unnest(list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '')) AS token " +
        "FROM documents), " +
        "tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tf FROM t " +
        "GROUP BY token), " +
        "r AS (SELECT tf, CAST(ROW_NUMBER() OVER " +
        "(ORDER BY tf DESC, token) AS BIGINT) AS rk FROM tf), " +
        "xy AS (SELECT ln(CAST(rk AS DOUBLE)) AS x, " +
        "ln(CAST(tf AS DOUBLE)) AS y FROM r), " +
        "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types, " +
        "SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, " +
        "SUM(x * x) AS sxx, SUM(y * y) AS syy FROM xy) " +
        "SELECT n_types, " +
        "(CAST(n_types AS DOUBLE) * sxy - sx * sy) / " +
        "(CAST(n_types AS DOUBLE) * sxx - sx * sx) AS slope, " +
        "(sy - ((CAST(n_types AS DOUBLE) * sxy - sx * sy) / " +
        "(CAST(n_types AS DOUBLE) * sxx - sx * sx)) * sx) / " +
        "CAST(n_types AS DOUBLE) AS intercept, " +
        "((CAST(n_types AS DOUBLE) * sxy - sx * sy) * " +
        "(CAST(n_types AS DOUBLE) * sxy - sx * sy)) / " +
        "((CAST(n_types AS DOUBLE) * sxx - sx * sx) * " +
        "(CAST(n_types AS DOUBLE) * syy - sy * sy)) AS r2 " +
        "FROM s")

  private def q205Sql: String =
    ("WITH t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
        "w AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS nt " +
        "FROM t WHERE len(toks) > 0), " +
        "o AS (SELECT doc_id, toks, nt, CAST(COALESCE(SUM(nt) OVER (" +
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "1 PRECEDING), 0) AS BIGINT) AS off FROM w), " +
        "x AS (SELECT off, toks, unnest(range(1, len(toks) + 1)) AS i " +
        "FROM o), " +
        "tk AS (SELECT toks[CAST(i AS INT)] AS token, off + i AS gpos " +
        "FROM x), " +
        "fp AS (SELECT token, MIN(gpos) AS first_pos FROM tk " +
        "GROUP BY token), " +
        "tt AS (SELECT CAST(SUM(nt) AS BIGINT) AS n_total FROM w), " +
        "d AS (SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS decile), " +
        "chk AS (SELECT decile, (decile * n_total + 9) // 10 " +
        "AS n_tokens FROM d CROSS JOIN tt), " +
        "vc AS (SELECT chk.decile, chk.n_tokens, " +
        "CAST(COUNT(*) AS BIGINT) AS vocab FROM chk " +
        "JOIN fp ON fp.first_pos <= chk.n_tokens GROUP BY 1, 2), " +
        "fit AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, " +
        "SUM(ln(CAST(n_tokens AS DOUBLE))) AS sx, " +
        "SUM(ln(CAST(vocab AS DOUBLE))) AS sy, " +
        "SUM(ln(CAST(n_tokens AS DOUBLE)) * ln(CAST(vocab AS DOUBLE))) " +
        "AS sxy, " +
        "SUM(ln(CAST(n_tokens AS DOUBLE)) * ln(CAST(n_tokens AS DOUBLE))) " +
        "AS sxx FROM vc) " +
        "SELECT vc.decile, vc.n_tokens, vc.vocab, " +
        "(fit.n * fit.sxy - fit.sx * fit.sy) / " +
        "(fit.n * fit.sxx - fit.sx * fit.sx) AS beta " +
        "FROM vc CROSS JOIN fit ORDER BY vc.decile")

  private def q335Sql: String =
      ("WITH d AS (SELECT lang, doc_id, " +
        "md5('bal|' || CAST(doc_id AS VARCHAR)) AS h FROM documents), " +
        "k AS (SELECT CAST(MIN(n) AS BIGINT) AS k FROM " +
        "(SELECT lang, COUNT(*) AS n FROM d GROUP BY 1)), " +
        "r AS (SELECT lang, doc_id, h, CAST(ROW_NUMBER() OVER " +
        "(PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS rk " +
        "FROM d) " +
        "SELECT lang, rk, doc_id, h FROM r " +
        "WHERE rk <= (SELECT k FROM k) ORDER BY lang, rk")

  private def q336Sql: String =
    ("WITH t AS (SELECT n_chars, " +
      "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
      "AS toks FROM documents), " +
      "f AS (SELECT CASE WHEN n_chars <= 1 THEN 0 ELSE " +
      "CAST(length(bin(n_chars)) - 1 AS BIGINT) END AS bucket, " +
      "CAST(len(toks) >= 20 AND " +
      "CAST(len(list_distinct(toks)) AS DOUBLE) / " +
      "CAST(len(toks) AS DOUBLE) > 0.1 AND " +
      "CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) " +
      "AS DOUBLE) / CAST(len(toks) AS DOUBLE) < 0.5 AS BIGINT) AS y " +
      "FROM t), " +
      "c AS (SELECT bucket, CAST(SUM(y) AS BIGINT) AS n_good, " +
      "CAST(SUM(1 - y) AS BIGINT) AS n_bad FROM f GROUP BY 1), " +
      "tt AS (SELECT CAST(SUM(n_good) AS BIGINT) AS g, " +
      "CAST(SUM(n_bad) AS BIGINT) AS b FROM c), " +
      "s AS (SELECT c.bucket, c.n_good, c.n_bad, " +
      "CAST(c.n_good + 1 AS DOUBLE) / CAST(tt.g + 1 AS DOUBLE) AS pg, " +
      "CAST(c.n_bad + 1 AS DOUBLE) / CAST(tt.b + 1 AS DOUBLE) AS pb " +
      "FROM c CROSS JOIN tt), " +
      "x AS (SELECT *, ln(pg) - ln(pb) AS woe, " +
      "(pg - pb) * (ln(pg) - ln(pb)) AS iv_contrib FROM s), " +
      "iv AS (SELECT SUM(iv_contrib) AS iv_total FROM x) " +
      "SELECT bucket, n_good, n_bad, woe, iv_contrib, iv.iv_total " +
      "FROM x CROSS JOIN iv ORDER BY bucket")

  private def q330Sql: String =
    ("WITH tok AS (SELECT source, " +
      "unnest(list_filter(string_split_regex(text, '\\s+'), " +
      "x -> x <> '')) AS term FROM documents), " +
      "c AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt " +
      "FROM tok GROUP BY 1, 2), " +
      "st AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS t_s " +
      "FROM c GROUP BY 1), " +
      "ct AS (SELECT term, CAST(SUM(cnt) AS BIGINT) AS c_all " +
      "FROM c GROUP BY 1), " +
      "tt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t_all FROM c), " +
      "sc AS (SELECT c.source, c.term, c.cnt, " +
      "ct.c_all - c.cnt AS c_rest, " +
      "ln(CAST(c.cnt + 1 AS DOUBLE) / " +
      "CAST(st.t_s - c.cnt + 1 AS DOUBLE)) - " +
      "ln(CAST(ct.c_all - c.cnt + 1 AS DOUBLE) / " +
      "CAST(tt.t_all - st.t_s - (ct.c_all - c.cnt) + 1 AS DOUBLE)) " +
      "AS log_odds FROM c JOIN st USING (source) " +
      "JOIN ct USING (term) CROSS JOIN tt), " +
      "rk AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source " +
      "ORDER BY log_odds DESC, term) AS BIGINT) AS rank FROM sc) " +
      "SELECT source, rank, term, cnt, CAST(c_rest AS BIGINT) " +
      "AS c_rest, log_odds FROM rk WHERE rank <= 5 " +
      "ORDER BY source, rank")

  private def q332Sql: String =
    ("WITH tok AS (SELECT source, " +
      "unnest(list_filter(string_split_regex(text, '\\s+'), " +
      "x -> x <> '')) AS term FROM documents), " +
      "stt AS (SELECT DISTINCT source, term FROM tok), " +
      "sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n " +
      "FROM stt GROUP BY 1), " +
      "pr AS (SELECT a.source AS source_a, b.source AS source_b, " +
      "CAST(COUNT(*) AS BIGINT) AS inter FROM stt a JOIN stt b " +
      "ON a.term = b.term AND a.source < b.source GROUP BY 1, 2) " +
      "SELECT pr.source_a, pr.source_b, sa.n AS n_a, sb.n AS n_b, " +
      "pr.inter, CAST(pr.inter AS DOUBLE) / " +
      "CAST(sa.n + sb.n - pr.inter AS DOUBLE) AS jaccard " +
      "FROM pr JOIN sz sa ON pr.source_a = sa.source " +
      "JOIN sz sb ON pr.source_b = sb.source " +
      "ORDER BY pr.source_a, pr.source_b")

  private def q305Sql: String =
    ("WITH t AS (SELECT source, " +
      "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
      "AS toks FROM documents), " +
      "f AS (SELECT * FROM t WHERE len(toks) >= 2), " +
      "bg AS (SELECT source, toks[CAST(p AS INT)] AS w1, " +
      "toks[CAST(p + 1 AS INT)] AS w2 " +
      "FROM f, unnest(range(1, len(toks))) u(p)), " +
      "c AS (SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt " +
      "FROM bg GROUP BY 1, 2, 3), " +
      "cx AS (SELECT source, w1, CAST(SUM(cnt) AS BIGINT) AS c1 " +
      "FROM c GROUP BY 1, 2), " +
      "nc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_contexts " +
      "FROM cx GROUP BY 1), " +
      "a AS (SELECT c.source, CAST(SUM(c.cnt) AS BIGINT) AS n_bigrams, " +
      "CAST(COUNT(*) AS BIGINT) AS n_pairs, " +
      "SUM(CAST(c.cnt AS DOUBLE) * ln(CAST(c.cnt AS DOUBLE) / " +
      "CAST(cx.c1 AS DOUBLE))) AS sl " +
      "FROM c JOIN cx ON c.source = cx.source AND c.w1 = cx.w1 " +
      "GROUP BY 1) " +
      "SELECT a.source, a.n_bigrams, nc.n_contexts, a.n_pairs, " +
      "-a.sl / CAST(a.n_bigrams AS DOUBLE) AS entropy_rate, " +
      "exp(-a.sl / CAST(a.n_bigrams AS DOUBLE)) AS perplexity " +
      "FROM a JOIN nc ON a.source = nc.source ORDER BY a.source")

  private def q307Sql: String =
    ("WITH tok AS (SELECT source, " +
      "unnest(list_filter(string_split_regex(text, '\\s+'), " +
      "x -> x <> '')) AS term FROM documents), " +
      "c AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt " +
      "FROM tok GROUP BY 1, 2), " +
      "a AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_tokens, " +
      "CAST(COUNT(*) AS BIGINT) AS n_terms, " +
      "SUM(CAST(cnt AS HUGEINT) * cnt) AS ssq FROM c GROUP BY 1) " +
      "SELECT source, n_tokens, n_terms, " +
      "CAST(ssq AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * " +
      "CAST(n_tokens AS DOUBLE)) AS hhi, " +
      "(CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) / " +
      "CAST(ssq AS DOUBLE) AS effective_vocab " +
      "FROM a ORDER BY source")

  private def q200Sql: String =
    ("WITH r AS (SELECT source, n_chars, " +
      "CAST(ROW_NUMBER() OVER (PARTITION BY source " +
      "ORDER BY n_chars, doc_id) AS BIGINT) AS rk, " +
      "CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n " +
      "FROM documents), " +
      "d AS (SELECT source, n_chars, rk, n, " +
      "unnest(range(1, 10)) AS decile FROM r) " +
      "SELECT source, CAST(decile AS BIGINT) AS decile, " +
      "n_chars AS value, n AS n_docs FROM d " +
      "WHERE rk = CAST(ceil(CAST(decile AS DOUBLE) * CAST(n AS DOUBLE) " +
      "/ 10.0) AS BIGINT) ORDER BY source, decile")

  /** The q200 rank-selection decile CTEs over an arbitrary doc
    * relation, prefix-parameterized so q258 can hold the exact and
    * sampled chains side by side. Exposes `<p>_d(source, decile,
    * value, n_docs)`.
    */
  private def decileCtes(p: String, rel: String): String =
    (s"${p}_r AS (SELECT source, n_chars, " +
      "CAST(ROW_NUMBER() OVER (PARTITION BY source " +
      "ORDER BY n_chars, doc_id) AS BIGINT) AS rk, " +
      "CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n " +
      s"FROM $rel), " +
      s"${p}_u AS (SELECT source, n_chars, rk, n, " +
      s"unnest(range(1, 10)) AS decile FROM ${p}_r), " +
      s"${p}_d AS (SELECT source, CAST(decile AS BIGINT) AS decile, " +
      "n_chars AS value, n AS n_docs " +
      s"FROM ${p}_u WHERE rk = CAST(ceil(CAST(decile AS DOUBLE) * " +
      "CAST(n AS DOUBLE) / 10.0) AS BIGINT))")

  private def q216Sql: String = {
    val steps = 8
    val prelude =
      "WITH t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
        "sp AS (SELECT toks, (strpos('0123456789abcdef', " +
        "substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) " +
        "* 16 + strpos('0123456789abcdef', substr(md5('split|' || " +
        "CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS bb FROM t), " +
        "tr AS (SELECT toks FROM sp WHERE bb < 204), " +
        "bgt AS (SELECT toks[CAST(p AS INT)] AS wa, " +
        "toks[CAST(p + 1 AS INT)] AS wb " +
        "FROM tr, unnest(range(1, len(toks))) u(p)), " +
        "bi AS (SELECT wa, wb, CAST(COUNT(*) AS BIGINT) AS cb " +
        "FROM bgt GROUP BY 1, 2), " +
        "uni AS (SELECT tok, COUNT(*) AS cu FROM " +
        "(SELECT unnest(toks) AS tok FROM tr) GROUP BY 1), " +
        "s0 AS (SELECT tok AS next_tok FROM (SELECT tok, " +
        "ROW_NUMBER() OVER (ORDER BY cu DESC, tok) AS rn FROM uni) " +
        "WHERE rn = 1)"
    val chain = (1 to steps).map { i =>
      s"g$i AS (SELECT CAST($i AS BIGINT) AS step, " +
        s"p.next_tok AS context, b.wb AS next_tok, " +
        s"b.cb AS c_bigram FROM bi b " +
        s"JOIN ${if (i == 1) "s0" else s"g${i - 1}"} p " +
        "ON b.wa = p.next_tok " +
        "ORDER BY b.cb DESC, b.wb LIMIT 1)"
    }.mkString(", ", ", ", " ")
    val union = (1 to steps)
      .map(i => s"SELECT step, context, next_tok, c_bigram FROM g$i")
      .mkString(" UNION ALL ")
    prelude + chain + "SELECT * FROM (" + union + ") ORDER BY step"
  }

  // Registry's size-sum check only catches CROSS-family collisions —
  // a key duplicated between the two intra-family maps would silently
  // shadow here, so pin disjointness at construction
  require(sql1.keySet.intersect(sql2.keySet).isEmpty,
    s"duplicate oracle keys: ${sql1.keySet.intersect(sql2.keySet)}")
  val sql: Map[String, String] = sql1 ++ sql2
}
