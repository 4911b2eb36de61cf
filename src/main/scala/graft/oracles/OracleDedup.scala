package graft.oracles

/** DuckDB oracle SQL — document dedup family (exact, minhash/LSH, containment, simhash, winnowing, boilerplate).
  *
  * Split out of `graft.Registry` (which had grown past 1,900 lines);
  * `Registry.oracleSql` merges the per-family maps and asserts key
  * disjointness. Entry text is unchanged — column aliases and total-
  * order sorts still mirror the Spark queries exactly.
  */
private[graft] object OracleDedup {

  /** Unroll depth of the q204 oracle peel. The engine iterates to
    * fixpoint; the spec asserts the fixture's round count stays under
    * this, which is what makes the unrolled SQL the exact answer.
    * (Declared before `sql`: the map literal evaluates q204Sql at
    * object init, so this val must already be set.)
    */
  val KCoreRounds = 12

  // shared CTE fragments for the r12-advice-#6 folds (q75/q86/q111/
  // q112/q116): the q95 md5 shingle/signature chain and the q102
  // simhash signature chain, reused verbatim so the folded queries
  // stay bit-aligned with their established families
  private val mhShingleCtes =
    "t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
      "x -> x <> '') AS toks FROM documents), " +
      "s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), " +
      "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS sh FROM t), " +
      "f AS (SELECT * FROM s WHERE len(sh) > 0), " +
      "e AS (SELECT doc_id, unnest(sh) AS g FROM f)"

  private val mhBand8Ctes =
    "sig AS (SELECT doc_id, " +
      "MIN(md5(g || '#0')) AS m0, MIN(md5(g || '#1')) AS m1, " +
      "MIN(md5(g || '#2')) AS m2, MIN(md5(g || '#3')) AS m3, " +
      "MIN(md5(g || '#4')) AS m4, MIN(md5(g || '#5')) AS m5, " +
      "MIN(md5(g || '#6')) AS m6, MIN(md5(g || '#7')) AS m7 " +
      "FROM e GROUP BY doc_id), " +
      "band AS (SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bucket FROM sig " +
      "UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM sig " +
      "UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM sig " +
      "UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM sig)"

  // NB: BIGRAM tf-weighted majority votes — unigram votes (distinct
  // or tf) are corpus-distribution-dominated on the fixture
  // vocabulary and the 15-bit band keys go quadratic; q102's
  // distinct-unigram signature is a different, deliberately
  // set-valued contract
  private val simhashSigCtes =
    "t AS (SELECT doc_id, list_filter(" +
      "string_split_regex(text, '\\s+'), x -> x <> '') AS toks " +
      "FROM documents), " +
      "f AS (SELECT doc_id, list_transform(range(1, len(toks)), " +
      "i -> md5(toks[i] || ' ' || toks[i + 1])) AS hs, " +
      "len(toks) - 1 AS n FROM t WHERE len(toks) > 1), " +
      "sg AS (SELECT doc_id, array_to_string(list_transform(range(0, 60), b -> " +
      "CASE WHEN 2 * list_sum(list_transform(hs, h -> " +
      "CAST(FLOOR((strpos('0123456789abcdef', " +
      "substr(h, CAST(b // 4 AS INTEGER) + 1, 1)) - 1) / " +
      "([8,4,2,1][CAST(b % 4 AS INTEGER) + 1])) AS INTEGER) % 2)) >= n " +
      "THEN '1' ELSE '0' END), '') AS sig FROM f)"

  val sql: Map[String, String] = Map(
    // q75 fold: q102's 60-bit signatures, four 15-bit pigeonhole bands
    // (Hamming <= 3 leaves >= 1 band intact -> full recall), exact
    // Hamming verify per candidate
    "q75_simhash_neardup" ->
      (s"WITH $simhashSigCtes, " +
        "bd AS (SELECT doc_id, sig, 0 AS band, substr(sig, 1, 15) AS bk FROM sg " +
        "UNION ALL SELECT doc_id, sig, 1, substr(sig, 16, 15) FROM sg " +
        "UNION ALL SELECT doc_id, sig, 2, substr(sig, 31, 15) FROM sg " +
        "UNION ALL SELECT doc_id, sig, 3, substr(sig, 46, 15) FROM sg), " +
        "keep AS (SELECT band, bk FROM bd GROUP BY band, bk " +
        "HAVING COUNT(*) <= 64), " +
        "kb AS (SELECT bd.doc_id, bd.sig, bd.band, bd.bk FROM bd " +
        "JOIN keep ON bd.band = keep.band AND bd.bk = keep.bk), " +
        "p AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b, " +
        "l.sig AS sig_a, r.sig AS sig_b FROM kb l JOIN kb r " +
        "ON l.band = r.band AND l.bk = r.bk AND l.doc_id < r.doc_id), " +
        "h AS (SELECT id_a, id_b, CAST(len(list_filter(range(1, 61), i -> " +
        "substr(sig_a, CAST(i AS INTEGER), 1) <> " +
        "substr(sig_b, CAST(i AS INTEGER), 1))) AS BIGINT) AS hamming FROM p) " +
        "SELECT id_a, id_b, hamming FROM h WHERE hamming <= 3 " +
        "ORDER BY id_a, id_b"),
    // q86 fold: the q95/q145 chain restricted to batch x corpus pairs
    // (doc_id%10=9 is "today's crawl") — the incremental candidate
    // discipline hash-checked
    "q86_incremental_dedup" ->
      (s"WITH $mhShingleCtes, $mhBand8Ctes, " +
        "p AS (SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id " +
        "FROM band n JOIN band c ON n.band = c.band AND n.bucket = c.bucket " +
        "WHERE n.doc_id % 10 = 9 AND c.doc_id % 10 <> 9), " +
        "v AS (SELECT new_id, corpus_id, len(list_intersect(a.sh, b.sh)) AS inter, " +
        "len(a.sh) AS la, len(b.sh) AS lb " +
        "FROM p JOIN f a ON a.doc_id = p.new_id JOIN f b ON b.doc_id = p.corpus_id) " +
        "SELECT new_id, corpus_id, " +
        "CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) AS jaccard FROM v " +
        "WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) >= 0.5 " +
        "ORDER BY new_id, corpus_id"),
    // q111 fold: TIGHT banding — 16 perms, 4 rows/band (spurious
    // candidates survive at jaccard^4), hot-bucket cap spelled, and
    // asymmetric containment |A∩B|/min verification
    "q111_containment_tight" ->
      (s"WITH $mhShingleCtes, " +
        "sig AS (SELECT doc_id, " +
        "MIN(md5(g || '#0')) AS m0, MIN(md5(g || '#1')) AS m1, " +
        "MIN(md5(g || '#2')) AS m2, MIN(md5(g || '#3')) AS m3, " +
        "MIN(md5(g || '#4')) AS m4, MIN(md5(g || '#5')) AS m5, " +
        "MIN(md5(g || '#6')) AS m6, MIN(md5(g || '#7')) AS m7, " +
        "MIN(md5(g || '#8')) AS m8, MIN(md5(g || '#9')) AS m9, " +
        "MIN(md5(g || '#10')) AS m10, MIN(md5(g || '#11')) AS m11, " +
        "MIN(md5(g || '#12')) AS m12, MIN(md5(g || '#13')) AS m13, " +
        "MIN(md5(g || '#14')) AS m14, MIN(md5(g || '#15')) AS m15 " +
        "FROM e GROUP BY doc_id), " +
        "band AS (SELECT doc_id, 0 AS band, " +
        "md5(m0 || '|' || m1 || '|' || m2 || '|' || m3) AS bucket FROM sig " +
        "UNION ALL SELECT doc_id, 1, " +
        "md5(m4 || '|' || m5 || '|' || m6 || '|' || m7) FROM sig " +
        "UNION ALL SELECT doc_id, 2, " +
        "md5(m8 || '|' || m9 || '|' || m10 || '|' || m11) FROM sig " +
        "UNION ALL SELECT doc_id, 3, " +
        "md5(m12 || '|' || m13 || '|' || m14 || '|' || m15) FROM sig), " +
        "keep AS (SELECT band, bucket FROM band GROUP BY band, bucket " +
        "HAVING COUNT(*) <= 64), " +
        "kb AS (SELECT band.doc_id, band.band, band.bucket FROM band " +
        "JOIN keep ON band.band = keep.band AND band.bucket = keep.bucket), " +
        "p AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b " +
        "FROM kb l JOIN kb r ON l.band = r.band AND l.bucket = r.bucket " +
        "WHERE l.doc_id < r.doc_id), " +
        "v AS (SELECT id_a, id_b, len(list_intersect(a.sh, b.sh)) AS inter, " +
        "least(len(a.sh), len(b.sh)) AS mn " +
        "FROM p JOIN f a ON a.doc_id = p.id_a JOIN f b ON b.doc_id = p.id_b) " +
        "SELECT id_a, id_b, " +
        "CAST(inter AS DOUBLE) / CAST(mn AS DOUBLE) AS containment FROM v " +
        "WHERE CAST(inter AS DOUBLE) / CAST(mn AS DOUBLE) >= 0.5 " +
        "ORDER BY id_a, id_b"),
    // q112 fold: q119's md5 winnow posting-list candidates + md5
    // shingle-set containment verify — the embedded-short-in-long
    // detector fully oracled
    "q112_containment_asym" ->
      ("WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '') AS toks FROM documents), " +
        "g AS (SELECT doc_id, list_transform(range(1, len(toks) - 1), " +
        "i -> md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS h " +
        "FROM t), " +
        "f AS (SELECT doc_id, CASE WHEN len(h) >= 8 THEN " +
        "list_distinct(list_transform(range(1, len(h) - 6), " +
        "j -> list_aggregate(list_slice(h, CAST(j AS INTEGER), " +
        "CAST(j + 7 AS INTEGER)), 'min'))) " +
        "ELSE [list_aggregate(h, 'min')] END AS fps " +
        "FROM g WHERE len(h) > 0), " +
        "e AS (SELECT doc_id, unnest(fps) AS fp FROM f), " +
        "cap AS (SELECT fp FROM e GROUP BY fp " +
        "HAVING COUNT(*) BETWEEN 2 AND 20), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id " +
        "JOIN cap c ON a.fp = c.fp), " +
        "r AS (SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS n_shared " +
        "FROM p GROUP BY id_a, id_b HAVING COUNT(*) >= 2), " +
        "qs AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS sh FROM t), " +
        "qf AS (SELECT * FROM qs WHERE len(sh) > 0), " +
        "v AS (SELECT id_a, id_b, n_shared, " +
        "len(list_intersect(a.sh, b.sh)) AS inter, " +
        "least(len(a.sh), len(b.sh)) AS mn " +
        "FROM r JOIN qf a ON a.doc_id = r.id_a JOIN qf b ON b.doc_id = r.id_b) " +
        "SELECT id_a, id_b, n_shared, " +
        "CAST(inter AS DOUBLE) / CAST(mn AS DOUBLE) AS containment FROM v " +
        "WHERE CAST(inter AS DOUBLE) / CAST(mn AS DOUBLE) >= 0.5 " +
        "ORDER BY id_a, id_b"),
    // q116 fold: q145's streaming chain with the CORPUS side in the
    // capped regime (HAVING COUNT(*) <= 2 — the quarantine fires on
    // the historical side; stream-vs-stream pairs stay uncapped so
    // the set is micro-batch-split-invariant)
    "q116_streaming_band_dedup" ->
      (s"WITH $mhShingleCtes, $mhBand8Ctes, " +
        "kc AS (SELECT band, bucket FROM band WHERE doc_id % 10 <> 9 " +
        "GROUP BY band, bucket HAVING COUNT(*) <= 2), " +
        "pc AS (SELECT n.doc_id AS new_id, c.doc_id AS corpus_id " +
        "FROM band n JOIN band c ON n.band = c.band AND n.bucket = c.bucket " +
        "JOIN kc ON c.band = kc.band AND c.bucket = kc.bucket " +
        "WHERE n.doc_id % 10 = 9 AND c.doc_id % 10 <> 9), " +
        "ps AS (SELECT n.doc_id AS new_id, c.doc_id AS corpus_id " +
        "FROM band n JOIN band c ON n.band = c.band AND n.bucket = c.bucket " +
        "WHERE n.doc_id % 10 = 9 AND c.doc_id % 10 = 9 AND n.doc_id > c.doc_id), " +
        "p AS (SELECT DISTINCT new_id, corpus_id FROM " +
        "(SELECT * FROM pc UNION ALL SELECT * FROM ps) u), " +
        "v AS (SELECT new_id, corpus_id, len(list_intersect(a.sh, b.sh)) AS inter, " +
        "len(a.sh) AS la, len(b.sh) AS lb " +
        "FROM p JOIN f a ON a.doc_id = p.new_id JOIN f b ON b.doc_id = p.corpus_id) " +
        "SELECT new_id, corpus_id, " +
        "CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) AS jaccard FROM v " +
        "WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) >= 0.5 " +
        "ORDER BY new_id, corpus_id"),
    "q28_exact_dedup" ->
      ("SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper, COUNT(*) AS n_copies " +
        "FROM documents GROUP BY md5(text) ORDER BY keeper"),
    // doc_id < 2000 makes the sample structurally bounded (≤200 docs)
    // at any corpus size — a no-op at the 500-doc correctness fixtures
    "q29_ngram_jaccard" ->
      ("WITH t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks " +
        "FROM documents WHERE doc_id % 10 = 0 AND doc_id < 2000), " +
        "s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS sh FROM t), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "len(list_intersect(a.sh, b.sh)) AS inter, " +
        "len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS uni " +
        "FROM s a, s b WHERE a.doc_id < b.doc_id) " +
        "SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter, CAST(uni AS BIGINT) AS uni, " +
        "CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard FROM p " +
        "WHERE inter > 0 ORDER BY jaccard DESC, id_a, id_b LIMIT 20"),
    // transitive closure over dup edges: DuckDB recursive CTE enumerates
    // reachability, min reachable id = cluster label (same as the
    // engine's min-label propagation fixpoint)
    "q66_dup_clusters" ->
      ("WITH RECURSIVE f AS (SELECT doc_id, md5(text) AS h1, " +
        "md5(array_to_string(list_sort(list_distinct(" +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))), ' ')) AS h2 " +
        "FROM documents), " +
        "e0 AS (SELECT MIN(doc_id) OVER (PARTITION BY h1) AS a, doc_id AS b FROM f " +
        "UNION ALL SELECT MIN(doc_id) OVER (PARTITION BY h2) AS a, doc_id AS b FROM f), " +
        "e AS (SELECT a, b FROM e0 WHERE a <> b " +
        "UNION SELECT b AS a, a AS b FROM e0 WHERE a <> b), " +
        "reach(id, r) AS (SELECT doc_id, doc_id FROM f " +
        "UNION SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.id), " +
        "c AS (SELECT id AS doc_id, MIN(r) AS cluster FROM reach GROUP BY id) " +
        "SELECT doc_id, cluster, COUNT(*) OVER (PARTITION BY cluster) AS n_members " +
        "FROM c ORDER BY doc_id"),
    // q482: clusters whose canonical (min member id) is erased but
    // which still have survivors, with the deterministically
    // re-elected representative — same recursive CC as q66
    "q482_canonical_reelection" ->
      ("WITH RECURSIVE f AS (SELECT doc_id, md5(text) AS h1, " +
        "md5(array_to_string(list_sort(list_distinct(" +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))), ' ')) AS h2 " +
        "FROM documents), " +
        "e0 AS (SELECT MIN(doc_id) OVER (PARTITION BY h1) AS a, doc_id AS b FROM f " +
        "UNION ALL SELECT MIN(doc_id) OVER (PARTITION BY h2) AS a, doc_id AS b FROM f), " +
        "e AS (SELECT a, b FROM e0 WHERE a <> b " +
        "UNION SELECT b AS a, a AS b FROM e0 WHERE a <> b), " +
        "reach(id, r) AS (SELECT doc_id, doc_id FROM f " +
        "UNION SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.id), " +
        "c AS (SELECT id AS doc_id, MIN(r) AS cluster FROM reach GROUP BY id), " +
        "g AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members, " +
        "CAST(SUM(CASE WHEN doc_id % 37 <> 0 THEN 1 ELSE 0 END) AS " +
        "BIGINT) AS n_surviving, " +
        "MIN(CASE WHEN doc_id % 37 <> 0 THEN doc_id END) AS " +
        "new_canonical FROM c GROUP BY cluster) " +
        "SELECT cluster AS old_canonical, new_canonical, n_members, " +
        "n_surviving FROM g WHERE cluster % 37 = 0 AND n_surviving > 0 " +
        "ORDER BY old_canonical"),
    "q94_span_dedup" ->
      ("WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '') AS toks FROM documents), " +
        "f AS (SELECT * FROM t WHERE len(toks) > 0), " +
        "s AS (SELECT doc_id, unnest(list_transform(" +
        "range(0, CAST(CEIL(CAST(len(toks) AS DOUBLE) / 25) AS BIGINT)), " +
        "i -> md5(array_to_string(toks[i * 25 + 1 : i * 25 + 25], ' ')))) AS span_hash FROM f), " +
        "g AS (SELECT span_hash, doc_id, COUNT(*) AS occ FROM s GROUP BY 1, 2), " +
        "w AS (SELECT *, COUNT(*) OVER (PARTITION BY span_hash) AS span_docs FROM g) " +
        "SELECT doc_id, CAST(SUM(occ) AS BIGINT) AS n_spans, " +
        "CAST(SUM(CASE WHEN span_docs >= 2 THEN occ ELSE 0 END) AS BIGINT) AS n_dup_spans, " +
        "CAST(SUM(CASE WHEN span_docs >= 2 THEN occ ELSE 0 END) AS DOUBLE) / " +
        "CAST(SUM(occ) AS DOUBLE) AS dup_span_ratio " +
        "FROM w GROUP BY doc_id ORDER BY doc_id"),
    // md5 is bit-identical across engines, so the minhash permutations
    // (min md5(shingle||'#'||seed)) and band buckets reproduce exactly —
    // the one hash family where LSH is fully oracle-checkable
    "q95_minhash_oracled" ->
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
    // q241: the q95 chain in the CAPPED regime — the hot-bucket
    // quarantine spelled out as HAVING COUNT(*) <= 2 over
    // (band, bucket), so DuckDB drops the same bucket members and the
    // quarantined candidate generation itself is hash-asserted
    // (r10 advice #4: cap 64 never fires at the fixtures; cap 2 does)
    "q241_minhash_capped" ->
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
        "keep AS (SELECT band, bucket FROM band GROUP BY band, bucket " +
        "HAVING COUNT(*) <= 2), " +
        "kb AS (SELECT band.doc_id, band.band, band.bucket FROM band " +
        "JOIN keep ON band.band = keep.band AND band.bucket = keep.bucket), " +
        "p AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b " +
        "FROM kb l JOIN kb r ON l.band = r.band AND l.bucket = r.bucket " +
        "WHERE l.doc_id < r.doc_id), " +
        "v AS (SELECT id_a, id_b, len(list_intersect(a.sh, b.sh)) AS inter, " +
        "len(a.sh) AS la, len(b.sh) AS lb " +
        "FROM p JOIN f a ON a.doc_id = p.id_a JOIN f b ON b.doc_id = p.id_b) " +
        "SELECT id_a, id_b, " +
        "CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) AS jaccard FROM v " +
        "WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) >= 0.5 " +
        "ORDER BY id_a, id_b"),
    // q426: the erased-corpus edge artifact maintained INCREMENTALLY
    // (retained stored edges + boundary-bucket repairs) must equal the
    // independent capped-chain re-derivation over the retained corpus
    // — hash equality IS the rebuild comparison the r14 verdict asked
    // for. Prefix `inc` is unique to this row.
    "q426_dup_edges_incremental" ->
      ("WITH incbase AS (SELECT * FROM documents WHERE doc_id % 37 <> 0), " +
        dupGraphCteBodyCapped("inc", "incbase") + " " +
        "SELECT id_a, id_b, " +
        "CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) AS jaccard FROM incv " +
        "WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) >= 0.5 " +
        "ORDER BY id_a, id_b"),
    // q427: the maintenance algebra certified end-to-end — full capped
    // chain, incident mass, quarantine boundary (over-cap buckets with
    // 2..cap survivors), erased capped chain. exact_identity is q390's
    // conservation flag: true iff no bucket crossed the cap boundary.
    // Prefixes `ixq`/`iyq` are unique to this row.
    "q427_dup_edges_incremental_census" ->
      ("WITH " + dupGraphCteBodyCapped("ixq", "documents") + ", " +
        "iyqbase AS (SELECT * FROM documents WHERE doc_id % 37 <> 0), " +
        dupGraphCteBodyCapped("iyq", "iyqbase") + ", " +
        "ixqhot AS (SELECT band, bucket FROM ixqband " +
        "GROUP BY band, bucket HAVING COUNT(*) > 64), " +
        "ixqsurv AS (SELECT band, bucket, COUNT(*) AS n_surv " +
        "FROM ixqband WHERE doc_id % 37 <> 0 GROUP BY band, bucket), " +
        "ixqbnd AS (SELECT h.band, h.bucket FROM ixqhot h " +
        "JOIN ixqsurv s ON h.band = s.band AND h.bucket = s.bucket " +
        "WHERE s.n_surv BETWEEN 2 AND 64), " +
        "ixqx AS (SELECT " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ixqed) AS n_edges_full, " +
        "(SELECT CAST(COALESCE(SUM(CASE WHEN a % 37 = 0 OR b % 37 = 0 " +
        "THEN 1 ELSE 0 END), 0) AS BIGINT) FROM ixqed) AS n_incident, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ixqhot) AS n_hot_buckets, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ixqbnd) " +
        "AS n_boundary_buckets, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM iyqed) AS n_edges_after) " +
        "SELECT n_edges_full, n_incident, " +
        "(n_edges_full - n_incident) AS n_retained, n_hot_buckets, " +
        "n_boundary_buckets, " +
        "(n_edges_after - (n_edges_full - n_incident)) AS n_repaired, " +
        "n_edges_after, " +
        "(n_edges_after = n_edges_full - n_incident) AS exact_identity " +
        "FROM ixqx"),
    // hex-nibble decode differs by function (conv in Spark, strpos
    // here) but the VALUES are identical small ints, so the 60-bit
    // majority signature hash-matches exactly
    "q102_simhash_oracled" ->
      ("WITH t AS (SELECT doc_id, list_distinct(list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '')) AS toks " +
        "FROM documents), " +
        "f AS (SELECT doc_id, list_transform(toks, t -> md5(t)) AS hs, " +
        "len(toks) AS n FROM t WHERE len(toks) > 0) " +
        "SELECT doc_id, CAST(n AS BIGINT) AS n_toks, " +
        "array_to_string(list_transform(range(0, 60), b -> " +
        "CASE WHEN 2 * list_sum(list_transform(hs, h -> " +
        "CAST(FLOOR((strpos('0123456789abcdef', " +
        "substr(h, CAST(b // 4 AS INTEGER) + 1, 1)) - 1) / " +
        "([8,4,2,1][CAST(b % 4 AS INTEGER) + 1])) AS INTEGER) % 2)) >= n " +
        "THEN '1' ELSE '0' END), '') AS sig " +
        "FROM f ORDER BY doc_id"),
    // same md5-LSH candidate machinery as q95; the verified metric is
    // the asymmetric containment |A∩B| / min(|A|,|B|)
    // doc_id < 2000 mirrors the engine's structural cap on the oracle
    // twin (no-op at the ≤500-doc correctness fixtures; q111 is the
    // uncapped capacity path)
    "q109_containment_dedup" ->
      ("WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '') AS toks FROM documents WHERE doc_id < 2000), " +
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
        "p AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b " +
        "FROM band l JOIN band r ON l.band = r.band AND l.bucket = r.bucket " +
        "WHERE l.doc_id < r.doc_id), " +
        "v AS (SELECT id_a, id_b, len(list_intersect(a.sh, b.sh)) AS inter, " +
        "len(a.sh) AS la, len(b.sh) AS lb " +
        "FROM p JOIN f a ON a.doc_id = p.id_a JOIN f b ON b.doc_id = p.id_b) " +
        "SELECT id_a, id_b, " +
        "CAST(inter AS DOUBLE) / CAST(LEAST(la, lb) AS DOUBLE) AS containment " +
        "FROM v " +
        "WHERE CAST(inter AS DOUBLE) / CAST(LEAST(la, lb) AS DOUBLE) >= 0.5 " +
        "ORDER BY id_a, id_b"),
    // keeper = lowest (doc_id, span_idx) per paragraph text; the md5 of
    // each reassembled doc proves byte-exact reassembly cross-engine
    "q114_paragraph_dedup" ->
      ("WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '') AS toks FROM documents), " +
        "f AS (SELECT * FROM t WHERE len(toks) > 0), " +
        "s AS (SELECT doc_id, toks, unnest(range(0, " +
        "CAST(ceil(len(toks) / 25.0) AS BIGINT))) AS span_idx FROM f), " +
        "s2 AS (SELECT doc_id, span_idx, array_to_string(list_slice(toks, " +
        "CAST(span_idx * 25 + 1 AS INTEGER), " +
        "CAST(span_idx * 25 + 25 AS INTEGER)), ' ') AS sp FROM s), " +
        "k AS (SELECT doc_id, span_idx, sp, ROW_NUMBER() OVER " +
        "(PARTITION BY sp ORDER BY doc_id, span_idx) AS rn FROM s2), " +
        "r AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans, " +
        "CAST(COALESCE(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) " +
        "AS n_kept, " +
        "md5(COALESCE(array_to_string(list(sp ORDER BY span_idx) " +
        "FILTER (WHERE rn = 1), ' '), '')) AS kept_md5 " +
        "FROM k GROUP BY doc_id) " +
        "SELECT doc_id, n_spans, n_kept, " +
        "CAST(n_kept AS DOUBLE) / CAST(n_spans AS DOUBLE) AS keep_ratio, " +
        "kept_md5 FROM r ORDER BY doc_id"),
    // winnowing window-min spelled as list_aggregate over list_slice
    // windows; hex md5 min is byte-wise == the kernel's digest min
    "q119_winnow_oracled" ->
      ("WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '') AS toks FROM documents), " +
        "g AS (SELECT doc_id, list_transform(range(1, len(toks) - 1), " +
        "i -> md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS h " +
        "FROM t), " +
        "f AS (SELECT doc_id, CASE WHEN len(h) >= 8 THEN " +
        "list_distinct(list_transform(range(1, len(h) - 6), " +
        "j -> list_aggregate(list_slice(h, CAST(j AS INTEGER), " +
        "CAST(j + 7 AS INTEGER)), 'min'))) " +
        "ELSE [list_aggregate(h, 'min')] END AS fps " +
        "FROM g WHERE len(h) > 0), " +
        "e AS (SELECT doc_id, unnest(fps) AS fp FROM f), " +
        "cap AS (SELECT fp FROM e GROUP BY fp " +
        "HAVING COUNT(*) BETWEEN 2 AND 20), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id " +
        "JOIN cap c ON a.fp = c.fp), " +
        "r AS (SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS n_shared " +
        "FROM p GROUP BY id_a, id_b HAVING COUNT(*) >= 2) " +
        "SELECT id_a, id_b, n_shared FROM r ORDER BY id_a, id_b"),
    // df counted on raw span text; the engine counts md5(span) — the
    // same partition of spans absent a collision
    "q123_boilerplate_removal" ->
      ("WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '') AS toks FROM documents), " +
        "f AS (SELECT * FROM t WHERE len(toks) > 0), " +
        "s AS (SELECT doc_id, toks, unnest(range(0, " +
        "CAST(ceil(len(toks) / 25.0) AS BIGINT))) AS span_idx FROM f), " +
        "s2 AS (SELECT doc_id, span_idx, array_to_string(list_slice(toks, " +
        "CAST(span_idx * 25 + 1 AS INTEGER), " +
        "CAST(span_idx * 25 + 25 AS INTEGER)), ' ') AS sp FROM s), " +
        "d AS (SELECT sp, COUNT(DISTINCT doc_id) AS ndocs FROM s2 " +
        "GROUP BY sp), " +
        "k AS (SELECT s2.doc_id, s2.span_idx, s2.sp, " +
        "d.ndocs > 1 AS bp FROM s2 JOIN d ON s2.sp = d.sp), " +
        "r AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans, " +
        "CAST(COALESCE(SUM(CASE WHEN bp THEN 1 ELSE 0 END), 0) AS BIGINT) " +
        "AS n_removed, " +
        "md5(COALESCE(array_to_string(list(sp ORDER BY span_idx) " +
        "FILTER (WHERE NOT bp), ' '), '')) AS clean_md5 " +
        "FROM k GROUP BY doc_id) " +
        "SELECT doc_id, n_spans, n_removed, " +
        "CAST(n_spans - n_removed AS DOUBLE) / CAST(n_spans AS DOUBLE) " +
        "AS keep_ratio, clean_md5 FROM r ORDER BY doc_id"),
    // q148: canonical selection — the q95 chain gives the verified pair
    // graph; a recursive min-label fixpoint closes it transitively
    // (cross-checking the engine's pointer-jumping CC), then one window
    // picks the longest doc per cluster
    "q148_canonical_selection" ->
      ("WITH RECURSIVE t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
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
        "p AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b " +
        "FROM band l JOIN band r ON l.band = r.band AND l.bucket = r.bucket " +
        "WHERE l.doc_id < r.doc_id), " +
        "v AS (SELECT id_a, id_b, len(list_intersect(a.sh, b.sh)) AS inter, " +
        "len(a.sh) AS la, len(b.sh) AS lb " +
        "FROM p JOIN f a ON a.doc_id = p.id_a JOIN f b ON b.doc_id = p.id_b), " +
        "pj AS (SELECT id_a, id_b FROM v " +
        "WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) >= 0.5), " +
        "e2 AS (SELECT id_a AS a, id_b AS b FROM pj " +
        "UNION ALL SELECT id_b, id_a FROM pj), " +
        "lab AS (SELECT doc_id AS id, doc_id AS lbl FROM documents " +
        "UNION SELECT e2.a, lab.lbl FROM lab, e2 WHERE lab.id = e2.b), " +
        "cl AS (SELECT id, MIN(lbl) AS cluster FROM lab GROUP BY id) " +
        "SELECT d.doc_id, cl.cluster, " +
        "CAST(COUNT(*) OVER (PARTITION BY cl.cluster) AS BIGINT) AS n_members, " +
        "d.n_chars, " +
        "CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY cl.cluster " +
        "ORDER BY d.n_chars DESC, d.doc_id) = 1 THEN 1 ELSE 0 END AS BIGINT) " +
        "AS is_kept " +
        "FROM documents d JOIN cl ON cl.id = d.doc_id ORDER BY d.doc_id"),
    // q150: the q95 chain, candidates WITHOUT the threshold — per pair,
    // the perm-agreement estimate next to exact Jaccard and |error|
    "q150_minhash_estimate" ->
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
        "p AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b " +
        "FROM band l JOIN band r ON l.band = r.band AND l.bucket = r.bucket " +
        "WHERE l.doc_id < r.doc_id), " +
        "v AS (SELECT id_a, id_b, " +
        "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / " +
        "CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) " +
        "AS jaccard, " +
        "CAST((CASE WHEN sa.m0 = sb.m0 THEN 1 ELSE 0 END + " +
        "CASE WHEN sa.m1 = sb.m1 THEN 1 ELSE 0 END + " +
        "CASE WHEN sa.m2 = sb.m2 THEN 1 ELSE 0 END + " +
        "CASE WHEN sa.m3 = sb.m3 THEN 1 ELSE 0 END + " +
        "CASE WHEN sa.m4 = sb.m4 THEN 1 ELSE 0 END + " +
        "CASE WHEN sa.m5 = sb.m5 THEN 1 ELSE 0 END + " +
        "CASE WHEN sa.m6 = sb.m6 THEN 1 ELSE 0 END + " +
        "CASE WHEN sa.m7 = sb.m7 THEN 1 ELSE 0 END) AS DOUBLE) / 8.0 AS mh_est " +
        "FROM p JOIN f a ON a.doc_id = p.id_a JOIN f b ON b.doc_id = p.id_b " +
        "JOIN sig sa ON sa.doc_id = p.id_a JOIN sig sb ON sb.doc_id = p.id_b) " +
        "SELECT id_a, id_b, jaccard, mh_est, abs(mh_est - jaccard) AS abs_err " +
        "FROM v ORDER BY id_a, id_b"),
    // q160: the q95 verified pairs rolled up by canonical source pair
    "q160_source_dup_matrix" ->
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
        "p AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b " +
        "FROM band l JOIN band r ON l.band = r.band AND l.bucket = r.bucket " +
        "WHERE l.doc_id < r.doc_id), " +
        "v AS (SELECT id_a, id_b, " +
        "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / " +
        "CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) " +
        "AS jaccard " +
        "FROM p JOIN f a ON a.doc_id = p.id_a JOIN f b ON b.doc_id = p.id_b), " +
        "k AS (SELECT LEAST(da.source, db.source) AS source_lo, " +
        "GREATEST(da.source, db.source) AS source_hi, jaccard " +
        "FROM v JOIN documents da ON da.doc_id = v.id_a " +
        "JOIN documents db ON db.doc_id = v.id_b WHERE jaccard >= 0.5) " +
        "SELECT source_lo, source_hi, CAST(COUNT(*) AS BIGINT) AS n_pairs, " +
        "SUM(jaccard) / CAST(COUNT(*) AS DOUBLE) AS avg_jaccard " +
        "FROM k GROUP BY 1, 2 ORDER BY 1, 2"),
    // q170: near-dup decontamination — the q95 md5 chain run CROSS-side
    // over the q136 split (train bands vs held-out bands), exact-
    // Jaccard verified; the population-level hot-bucket cap is a
    // fixture no-op, so the uncapped SQL is the exact twin (q95
    // precedent)
    "q170_neardup_decontamination" ->
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
        "spl AS (SELECT doc_id, CASE WHEN b < 204 THEN 'train' " +
        "WHEN b < 230 THEN 'val' ELSE 'test' END AS split FROM " +
        "(SELECT doc_id, " +
        "(strpos('0123456789abcdef', substr(hk, 1, 1)) - 1) * 16 + " +
        "strpos('0123456789abcdef', substr(hk, 2, 1)) - 1 AS b FROM " +
        "(SELECT doc_id, md5('split|' || CAST(doc_id AS VARCHAR)) AS hk " +
        "FROM f))), " +
        "p AS (SELECT DISTINCT tr.doc_id AS train_id, ho.doc_id AS heldout_id " +
        "FROM band tr JOIN band ho ON tr.band = ho.band AND tr.bucket = ho.bucket " +
        "JOIN spl st ON st.doc_id = tr.doc_id " +
        "JOIN spl sh2 ON sh2.doc_id = ho.doc_id " +
        "WHERE st.split = 'train' AND sh2.split <> 'train'), " +
        "v AS (SELECT train_id, heldout_id, " +
        "len(list_intersect(a.sh, b.sh)) AS inter, " +
        "len(a.sh) AS la, len(b.sh) AS lb " +
        "FROM p JOIN f a ON a.doc_id = p.train_id " +
        "JOIN f b ON b.doc_id = p.heldout_id) " +
        "SELECT train_id, heldout_id, " +
        "(SELECT split FROM spl WHERE spl.doc_id = v.heldout_id) AS heldout_split, " +
        "CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) AS jaccard " +
        "FROM v WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) >= 0.5 " +
        "ORDER BY train_id, heldout_id"),
    // q167: sliding-window (w=15, stride 1) exact-substring dedup —
    // global first-occurrence keeper on window md5s, coverage-union
    // removal, byte-exact reassembly md5 of the surviving tokens
    "q167_window_dedup" ->
      ("WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '') AS toks FROM documents), " +
        "f AS (SELECT * FROM t WHERE len(toks) > 0), " +
        "w AS (SELECT doc_id, p AS pos, " +
        "md5(array_to_string(toks[p+1:p+15], ' ')) AS wh " +
        "FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - 14)) AS p " +
        "FROM f WHERE len(toks) >= 15)), " +
        "r AS (SELECT doc_id, pos, ROW_NUMBER() OVER " +
        "(PARTITION BY wh ORDER BY doc_id, pos) AS rn FROM w), " +
        "rem AS (SELECT doc_id, list(pos ORDER BY pos) AS starts, " +
        "COUNT(*) AS n_dup FROM r WHERE rn > 1 GROUP BY doc_id), " +
        "j AS (SELECT f.doc_id, toks, " +
        "COALESCE(starts, CAST([] AS BIGINT[])) AS starts, " +
        "COALESCE(n_dup, 0) AS n_dup FROM f " +
        "LEFT JOIN rem ON f.doc_id = rem.doc_id), " +
        "k AS (SELECT doc_id, toks, n_dup, " +
        "list_filter(range(0, len(toks)), tk -> " +
        "len(list_filter(starts, s -> s <= tk AND tk < s + 15)) = 0) " +
        "AS kept FROM j) " +
        "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, " +
        "CAST(greatest(len(toks) - 14, 0) AS BIGINT) AS n_windows, " +
        "CAST(n_dup AS BIGINT) AS n_dup_windows, " +
        "CAST(len(kept) AS BIGINT) AS n_kept_tokens, " +
        "CAST(len(kept) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS keep_ratio, " +
        "md5(COALESCE(array_to_string(" +
        "list_transform(kept, tk -> toks[CAST(tk + 1 AS INT)]), ' '), '')) " +
        "AS kept_md5 " +
        "FROM k ORDER BY doc_id"),
    // q174: the q167 window screen run incrementally — batch docs'
    // windows semi-joined against the HISTORICAL window-hash set
    // (history always wins), batch docs reassembled without the
    // borrowed spans
    "q174_incremental_window_dedup" -> q174Sql,
    // q175: q174 WIDENED by the state-append rule (r10): a batch
    // window is also borrowed when an EARLIER-id stream doc carries
    // it — the static form of the streaming min-doc state screen
    "q175_streaming_window_dedup" -> q175Sql,
    // q168: bucket-size histogram of the q95 md5 banding — the skew
    // telemetry the hot-bucket quarantine (Dedup.BandBucketCap = 64)
    // is tuned from; exact counts, fully oracled
    "q168_band_skew_telemetry" ->
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
        "c AS (SELECT band, bucket, COUNT(*) AS bucket_size " +
        "FROM band GROUP BY 1, 2) " +
        "SELECT CAST(band AS BIGINT) AS band, " +
        "CAST(bucket_size AS BIGINT) AS bucket_size, " +
        "CAST(COUNT(*) AS BIGINT) AS n_buckets, " +
        "CAST(bucket_size * COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(CASE WHEN bucket_size > 64 THEN 1 ELSE 0 END AS BIGINT) " +
        "AS over_cap " +
        "FROM c GROUP BY band, bucket_size ORDER BY band, bucket_size"),
    // q183: triangle census of the q95 verified pair graph — edges
    // oriented low-(degree, id) → high, wedges at each apex, closing
    // edge checked against the canonical edge set (each triangle
    // produced exactly once, at its unique lowest-(degree, id) apex)
    "q183_dup_graph_triangles" ->
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
        "p AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b " +
        "FROM band l JOIN band r ON l.band = r.band AND l.bucket = r.bucket " +
        "WHERE l.doc_id < r.doc_id), " +
        "v AS (SELECT id_a, id_b, len(list_intersect(a.sh, b.sh)) AS inter, " +
        "len(a.sh) AS la, len(b.sh) AS lb " +
        "FROM p JOIN f a ON a.doc_id = p.id_a JOIN f b ON b.doc_id = p.id_b), " +
        "ed AS (SELECT id_a AS a, id_b AS b FROM v " +
        "WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) >= 0.5), " +
        "und AS (SELECT a AS u, b AS w FROM ed " +
        "UNION ALL SELECT b, a FROM ed), " +
        "dg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS degree FROM und " +
        "GROUP BY u), " +
        "o AS (SELECT und.u, und.w FROM und " +
        "JOIN dg d1 ON d1.u = und.u JOIN dg d2 ON d2.u = und.w " +
        "WHERE d1.degree < d2.degree OR " +
        "(d1.degree = d2.degree AND und.u < und.w)), " +
        "wg AS (SELECT w1.u, w1.w AS ta, w2.w AS tb FROM o w1 " +
        "JOIN o w2 ON w1.u = w2.u AND w1.w < w2.w), " +
        "tri AS (SELECT wg.u, wg.ta, wg.tb FROM wg " +
        "JOIN ed ON ed.a = wg.ta AND ed.b = wg.tb), " +
        "tn AS (SELECT x AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles " +
        "FROM (SELECT unnest([u, ta, tb]) AS x FROM tri) GROUP BY x) " +
        "SELECT dg.u AS doc_id, dg.degree, " +
        "CAST(COALESCE(tn.n_triangles, 0) AS BIGINT) AS n_triangles " +
        "FROM dg LEFT JOIN tn ON tn.doc_id = dg.u ORDER BY doc_id"),
    // q186: the q148 chain rolled up into the cluster-size histogram
    // with the exact keep-one-per-cluster doc/char savings
    "q186_dedup_yield" ->
      ("WITH RECURSIVE t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
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
        "p AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b " +
        "FROM band l JOIN band r ON l.band = r.band AND l.bucket = r.bucket " +
        "WHERE l.doc_id < r.doc_id), " +
        "v AS (SELECT id_a, id_b, len(list_intersect(a.sh, b.sh)) AS inter, " +
        "len(a.sh) AS la, len(b.sh) AS lb " +
        "FROM p JOIN f a ON a.doc_id = p.id_a JOIN f b ON b.doc_id = p.id_b), " +
        "pj AS (SELECT id_a, id_b FROM v " +
        "WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) >= 0.5), " +
        "e2 AS (SELECT id_a AS a, id_b AS b FROM pj " +
        "UNION ALL SELECT id_b, id_a FROM pj), " +
        "lab AS (SELECT doc_id AS id, doc_id AS lbl FROM documents " +
        "UNION SELECT e2.a, lab.lbl FROM lab, e2 WHERE lab.id = e2.b), " +
        "cl AS (SELECT id, MIN(lbl) AS cluster FROM lab GROUP BY id), " +
        "base AS (SELECT d.doc_id, cl.cluster, " +
        "COUNT(*) OVER (PARTITION BY cl.cluster) AS n_members, d.n_chars, " +
        "CASE WHEN ROW_NUMBER() OVER (PARTITION BY cl.cluster " +
        "ORDER BY d.n_chars DESC, d.doc_id) = 1 THEN 1 ELSE 0 END " +
        "AS is_kept FROM documents d JOIN cl ON cl.id = d.doc_id) " +
        "SELECT CAST(n_members AS BIGINT) AS cluster_size, " +
        "CAST(COUNT(DISTINCT cluster) AS BIGINT) AS n_clusters, " +
        "CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(CASE WHEN is_kept = 0 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_docs_removed, " +
        "CAST(SUM(n_chars) AS BIGINT) AS chars_total, " +
        "CAST(SUM(CASE WHEN is_kept = 0 THEN n_chars ELSE 0 END) AS BIGINT) " +
        "AS chars_removed " +
        "FROM base GROUP BY n_members ORDER BY cluster_size"),
    // q191: exact prefix-filtered similarity join — rarest-first
    // (df, hash) order, prefix length n − ⌈t·n⌉ + 1, exact-verified
    "q191_prefix_filter_join" ->
      ("WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '') AS toks FROM documents), " +
        "s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS sh FROM t), " +
        "f AS (SELECT doc_id, list_distinct(list_transform(sh, " +
        "g -> substr(md5(g), 1, 16))) AS hs FROM s WHERE len(sh) > 0), " +
        "e AS (SELECT doc_id, unnest(hs) AS gh FROM f), " +
        "dfreq AS (SELECT gh, CAST(COUNT(*) AS BIGINT) AS df FROM e " +
        "GROUP BY gh), " +
        "r AS (SELECT e.doc_id, e.gh, ROW_NUMBER() OVER " +
        "(PARTITION BY e.doc_id ORDER BY dfreq.df, e.gh) AS rn, " +
        "COUNT(*) OVER (PARTITION BY e.doc_id) AS n " +
        "FROM e JOIN dfreq USING (gh)), " +
        "pre AS (SELECT doc_id, gh FROM r " +
        "WHERE rn <= n - CAST(ceil(0.5 * n) AS BIGINT) + 1), " +
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM pre a JOIN pre b ON a.gh = b.gh AND a.doc_id < b.doc_id), " +
        "v AS (SELECT id_a, id_b, len(list_intersect(fa.hs, fb.hs)) AS inter, " +
        "len(fa.hs) AS la, len(fb.hs) AS lb " +
        "FROM cand JOIN f fa ON fa.doc_id = cand.id_a " +
        "JOIN f fb ON fb.doc_id = cand.id_b) " +
        "SELECT id_a, id_b, " +
        "CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) AS jaccard " +
        "FROM v WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) " +
        ">= 0.5 ORDER BY id_a, id_b"),
    // q193: the FULL recursive closure over all q95 edges — the
    // strongest check of the contract-then-solve incremental path
    // (incremental composition must reproduce this labeling exactly).
    // q196 (the streaming form) shares it verbatim: min-label
    // composition is associative over batch arrival order, so any
    // micro-batching drains to this same labeling.
    "q193_incremental_cc" -> q193Sql,
    "q196_streaming_incremental_cc" -> q193Sql,
    // q197: S-curve recall planner — the q95 verified-pair jaccards
    // pushed through 1−(1−j^r)^b for every (r × b) split of the 8 perms
    "q197_banding_planner" ->
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
        "p AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b " +
        "FROM band l JOIN band r ON l.band = r.band AND l.bucket = r.bucket " +
        "WHERE l.doc_id < r.doc_id), " +
        "v AS (SELECT id_a, id_b, len(list_intersect(a.sh, b.sh)) AS inter, " +
        "len(a.sh) AS la, len(b.sh) AS lb " +
        "FROM p JOIN f a ON a.doc_id = p.id_a JOIN f b ON b.doc_id = p.id_b), " +
        "jc AS (SELECT CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) " +
        "AS jaccard FROM v " +
        "WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) >= 0.5), " +
        "cfg AS (SELECT * FROM (VALUES (1, 8), (2, 4), (4, 2), (8, 1)) " +
        "c(r, b)) " +
        "SELECT CAST(r AS BIGINT) AS r, CAST(b AS BIGINT) AS b, " +
        "POWER(1.0 / b, 1.0 / r) AS threshold, " +
        "CAST(COUNT(*) AS BIGINT) AS n_pairs, " +
        "AVG(1.0 - POWER(1.0 - POWER(jaccard, CAST(r AS DOUBLE)), " +
        "CAST(b AS DOUBLE))) AS expected_recall " +
        "FROM jc CROSS JOIN cfg GROUP BY r, b ORDER BY r"),
    // q209: per-source duplicate rate + Wilson 95% bounds — counts are
    // exact; the interval is one pinned double formula (z = 1.96)
    "q209_dup_rate_ci" ->
      ("WITH h AS (SELECT source, md5(text) AS h FROM documents), " +
        "dh AS (SELECT h FROM (SELECT h, COUNT(*) AS c FROM h " +
        "GROUP BY h) WHERE c >= 2), " +
        "s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs " +
        "FROM h GROUP BY source), " +
        "d AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_dup " +
        "FROM h JOIN dh USING (h) GROUP BY source), " +
        "j AS (SELECT s.source, s.n_docs, " +
        "CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup " +
        "FROM s LEFT JOIN d USING (source)), " +
        "c AS (SELECT source, n_docs, n_dup, " +
        "CAST(n_dup AS DOUBLE) / CAST(n_docs AS DOUBLE) AS p, " +
        "CAST(n_docs AS DOUBLE) AS n FROM j) " +
        "SELECT source, n_docs, n_dup, p AS dup_rate, " +
        "greatest(0.0, ((p + 1.96 * 1.96 / (2.0 * n)) / " +
        "(1.0 + 1.96 * 1.96 / n)) - ((1.96 * sqrt((p * (1.0 - p) + " +
        "1.96 * 1.96 / (4.0 * n)) / n)) / (1.0 + 1.96 * 1.96 / n))) " +
        "AS wilson_lo, " +
        "least(1.0, ((p + 1.96 * 1.96 / (2.0 * n)) / " +
        "(1.0 + 1.96 * 1.96 / n)) + ((1.96 * sqrt((p * (1.0 - p) + " +
        "1.96 * 1.96 / (4.0 * n)) / n)) / (1.0 + 1.96 * 1.96 / n))) " +
        "AS wilson_hi FROM c ORDER BY source"),
    // q204: k-core of the q95 pair graph — the peel unrolled to 12
    // rounds (KCoreRounds); the Spark side runs to fixpoint and the
    // Wave5Spec pins that the fixture converges within the unroll
    "q204_dup_graph_kcore" -> q204Sql,
    "q212_dup_graph_degrees" -> q212Sql,
    // q327: synchronous K-round label propagation — deterministic
    // (mode, ties to the smallest label), replayed round-for-round
    "q327_label_propagation" ->
      (dupGraphCte +
        ", l0 AS (SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM und)), " +
        lpaRounds(4) +
        " SELECT u AS node, lbl AS community FROM l4 ORDER BY node"),
    // q224: pairwise source-overlap — bottom-k (k = 64) minwise
    // Jaccard estimate over distinct (source, 3-shingle md5) sets,
    // audited against the exact pairwise Jaccard; all integer/hash
    // arithmetic until the two divisions. q228 (the streaming KMV-
    // merge twin) shares this SQL verbatim: bottom-k of a union equals
    // bottom-k of per-batch bottom-ks, so any micro-batch split drains
    // to the batch matrix
    "q224_source_overlap" -> q224Sql,
    "q228_streaming_source_overlap" -> q224Sql,
    // q225: q174 with the corpus window set as a stored artifact —
    // definitionally the same reference set, so q174's SQL verbatim
    "q225_window_dedup_persisted" -> q174Sql,
    // q235: the reference's Redis-SET dedup flow as a drained stream —
    // first occurrence per content hash wins (id order = the keyset-
    // pagination arrival contract), keeper annotated with its
    // stream-wide copy count
    "q235_streaming_exact_dedup" ->
      ("WITH d AS (SELECT doc_id, md5(text) AS h FROM documents), " +
        "m AS (SELECT h, MIN(doc_id) AS doc_id, " +
        "CAST(COUNT(*) AS BIGINT) AS n_copies FROM d GROUP BY h) " +
        "SELECT doc_id, h, n_copies FROM m ORDER BY doc_id"),
    // q243: duplicated-substring length ladder — per rung w, a doc
    // flags when one of its w-windows appears in >= 2 DISTINCT docs.
    // q251 (the streaming maintenance twin) shares this SQL verbatim:
    // window sets are append-only facts and the >= 2-distinct-docs
    // rule is order-insensitive, so any micro-batch split drains to
    // the batch ladder
    "q243_dup_substring_ladder" -> q243Sql,
    "q251_streaming_dup_ladder" -> q243Sql,
    // q254: the q95 verified pair set rolled up at Jaccard thresholds
    // — realized pair mass + documents touched per threshold
    "q254_dedup_threshold_sweep" -> q254Sql,
    // q256: q243's flags at SOURCE grain (nested-CTE wrap of q243Sql)
    "q256_dup_ladder_by_source" ->
      ("WITH lad AS (" + q243Sql + "), " +
        "src AS (SELECT doc_id, source FROM documents) " +
        "SELECT src.source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        Seq(10, 20, 40, 80).map(w =>
          s"CAST(SUM(dup_w$w) AS BIGINT) AS n_dup_w$w").mkString(", ") +
        ", CAST(SUM(CASE WHEN max_dup_w > 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_any_dup " +
        "FROM lad JOIN src ON src.doc_id = lad.doc_id " +
        "GROUP BY src.source ORDER BY src.source"),
    // q245: the decontamination family joined into one per-source
    // table over the q136 split — exact (shared content hash), lexical
    // (>= 2 shared distinct 3-grams, the q80 rule) and near-dup (the
    // q170 md5-LSH + Jaccard >= 0.5 screen) leak counts and rates
    "q245_contamination_scorecard" -> q245Sql,
    // q242: the forced drain-time compaction of q235's registry leaves
    // EXACTLY one (doc_id, hash) row per document — the lifecycle fact
    // the telemetry row pins cross-engine (file/byte telemetry is
    // run-shape and lives behind StreamState.telemetryDf, spec-pinned)
    "q242_compaction_telemetry" ->
      ("SELECT 'telemetry_probe/registry' AS state_table, " +
        "CAST(COUNT(*) AS BIGINT) AS rows_after FROM documents " +
        "ORDER BY state_table"),
    // q230: exact content hashes shared across language pairs — full
    // matrix including zero cells, share normalized by the smaller side
    "q230_cross_lingual_dups" ->
      ("WITH lh AS (SELECT DISTINCT lang, md5(text) AS h FROM documents), " +
        "c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM lh " +
        "GROUP BY lang), " +
        "sh AS (SELECT a.lang AS lang_a, b.lang AS lang_b, " +
        "CAST(COUNT(*) AS BIGINT) AS n_shared FROM lh a " +
        "JOIN lh b ON a.h = b.h AND a.lang < b.lang GROUP BY 1, 2) " +
        "SELECT ca.lang AS lang_a, cb.lang AS lang_b, " +
        "ca.n AS n_a, cb.n AS n_b, " +
        "CAST(COALESCE(sh.n_shared, 0) AS BIGINT) AS n_shared, " +
        "CAST(COALESCE(sh.n_shared, 0) AS DOUBLE) / " +
        "CAST(least(ca.n, cb.n) AS DOUBLE) AS share " +
        "FROM c ca JOIN c cb ON ca.lang < cb.lang " +
        "LEFT JOIN sh ON sh.lang_a = ca.lang AND sh.lang_b = cb.lang " +
        "ORDER BY lang_a, lang_b"),
    // q226: the curation funnel — q28 exact keeper, q95 pair chain
    // (greedy pairwise near-dup drop), q211 quality flag, counts and
    // retention per stage
    "q226_curation_funnel" ->
      ("WITH t AS (SELECT doc_id, md5(text) AS h, list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '') AS toks " +
        "FROM documents), " +
        "b AS (SELECT doc_id, h, CAST(len(toks) AS BIGINT) AS tc, " +
        "CAST(len(list_distinct(toks)) AS BIGINT) AS dtc, " +
        "CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) " +
        "AS BIGINT) AS stc FROM t), " +
        "ex AS (SELECT b.* FROM b JOIN (SELECT h, MIN(doc_id) AS did " +
        "FROM b GROUP BY h) kk ON b.doc_id = kk.did), " +
        "s2 AS (SELECT doc_id, list_distinct(list_transform(" +
        "range(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) " +
        "AS sh FROM t), " +
        "f AS (SELECT * FROM s2 WHERE len(sh) > 0), " +
        "e2 AS (SELECT doc_id, unnest(sh) AS g FROM f), " +
        "sig AS (SELECT doc_id, " +
        "MIN(md5(g || '#0')) AS m0, MIN(md5(g || '#1')) AS m1, " +
        "MIN(md5(g || '#2')) AS m2, MIN(md5(g || '#3')) AS m3, " +
        "MIN(md5(g || '#4')) AS m4, MIN(md5(g || '#5')) AS m5, " +
        "MIN(md5(g || '#6')) AS m6, MIN(md5(g || '#7')) AS m7 " +
        "FROM e2 GROUP BY doc_id), " +
        "band AS (SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bucket FROM sig " +
        "UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM sig " +
        "UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM sig " +
        "UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM sig), " +
        "p AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b " +
        "FROM band l JOIN band r ON l.band = r.band AND l.bucket = r.bucket " +
        "WHERE l.doc_id < r.doc_id), " +
        "v AS (SELECT id_a, id_b, len(list_intersect(a.sh, b.sh)) AS inter, " +
        "len(a.sh) AS la, len(b.sh) AS lb " +
        "FROM p JOIN f a ON a.doc_id = p.id_a JOIN f b ON b.doc_id = p.id_b), " +
        "drp AS (SELECT DISTINCT id_b AS doc_id FROM v " +
        "WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) >= 0.5), " +
        "nr AS (SELECT ex.* FROM ex WHERE ex.doc_id NOT IN " +
        "(SELECT doc_id FROM drp)), " +
        "ql AS (SELECT * FROM nr WHERE tc >= 20 " +
        "AND CAST(dtc AS DOUBLE) / CAST(tc AS DOUBLE) > 0.1 " +
        "AND CAST(stc AS DOUBLE) / CAST(tc AS DOUBLE) < 0.5), " +
        "st AS (" +
        "SELECT 0 AS stage_id, 'raw' AS stage, " +
        "CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(COALESCE(SUM(tc), 0) AS BIGINT) AS n_tokens FROM b " +
        "UNION ALL SELECT 1, 'exact_dedup', CAST(COUNT(*) AS BIGINT), " +
        "CAST(COALESCE(SUM(tc), 0) AS BIGINT) FROM ex " +
        "UNION ALL SELECT 2, 'near_dedup', CAST(COUNT(*) AS BIGINT), " +
        "CAST(COALESCE(SUM(tc), 0) AS BIGINT) FROM nr " +
        "UNION ALL SELECT 3, 'quality', CAST(COUNT(*) AS BIGINT), " +
        "CAST(COALESCE(SUM(tc), 0) AS BIGINT) FROM ql), " +
        "raw AS (SELECT CAST(COUNT(*) AS BIGINT) AS r_docs, " +
        "CAST(SUM(tc) AS BIGINT) AS r_tokens FROM b) " +
        "SELECT CAST(stage_id AS BIGINT) AS stage_id, stage, n_docs, " +
        "n_tokens, " +
        "CAST(n_docs AS DOUBLE) / CAST(r_docs AS DOUBLE) AS doc_retention, " +
        "CAST(n_tokens AS DOUBLE) / CAST(r_tokens AS DOUBLE) " +
        "AS token_retention " +
        "FROM st CROSS JOIN raw ORDER BY stage_id"),
  )

  /** q243: one window CTE + one >=2-distinct-docs set per rung. */
  private def q243Sql: String = {
    val rungs = Seq(10, 20, 40, 80)
    val wctes = rungs.map { w =>
      s"w$w AS (SELECT doc_id, " +
        s"md5(array_to_string(toks[p+1:p+$w], ' ')) AS wh " +
        s"FROM (SELECT doc_id, toks, " +
        s"unnest(range(0, len(toks) - ${w - 1})) AS p " +
        s"FROM f WHERE len(toks) >= $w)), " +
        s"d$w AS (SELECT DISTINCT doc_id FROM w$w WHERE wh IN " +
        s"(SELECT wh FROM w$w GROUP BY wh " +
        "HAVING COUNT(DISTINCT doc_id) >= 2))"
    }
    "WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, " +
      "'\\s+'), x -> x <> '') AS toks FROM documents), " +
      "f AS (SELECT * FROM t WHERE len(toks) > 0), " +
      wctes.mkString(", ") + " " +
      "SELECT f.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, " +
      rungs.map(w => "CAST(CASE WHEN d" + w + ".doc_id IS NOT NULL " +
        s"THEN 1 ELSE 0 END AS BIGINT) AS dup_w$w").mkString(", ") +
      ", CAST(CASE " +
      rungs.sorted.reverse.map(w =>
        s"WHEN d$w.doc_id IS NOT NULL THEN $w").mkString(" ") +
      " ELSE 0 END AS BIGINT) AS max_dup_w FROM f " +
      rungs.map(w => s"LEFT JOIN d$w ON f.doc_id = d$w.doc_id")
        .mkString(" ") +
      " ORDER BY f.doc_id"
  }

  /** q254: q95 chain + per-threshold rollups of the verified pairs. */
  private def q254Sql: String = {
    val thresholds = Seq("0.5", "0.6", "0.7", "0.8")
    "WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
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
      "p AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b " +
      "FROM band l JOIN band r ON l.band = r.band AND l.bucket = r.bucket " +
      "WHERE l.doc_id < r.doc_id), " +
      "v AS (SELECT id_a, id_b, len(list_intersect(a.sh, b.sh)) AS inter, " +
      "len(a.sh) AS la, len(b.sh) AS lb " +
      "FROM p JOIN f a ON a.doc_id = p.id_a JOIN f b ON b.doc_id = p.id_b), " +
      "j AS (SELECT id_a, id_b, " +
      "CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) AS jaccard " +
      "FROM v WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) " +
      ">= 0.5) " +
      thresholds.map(t =>
        s"SELECT CAST($t AS DOUBLE) AS threshold, " +
          s"(SELECT CAST(COUNT(*) AS BIGINT) FROM j WHERE jaccard >= $t) " +
          "AS n_pairs, " +
          "(SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT d FROM " +
          s"(SELECT id_a AS d FROM j WHERE jaccard >= $t " +
          s"UNION ALL SELECT id_b FROM j WHERE jaccard >= $t))) " +
          "AS n_docs_affected").mkString(" UNION ALL ") +
      " ORDER BY threshold"
  }

  /** q245: exact/lexical/near-dup leak members over the q136 split,
    * rolled up per source — the q80/q153/q170 rules as one table.
    */
  private def q245Sql: String =
    "WITH t AS (SELECT doc_id, source, md5(text) AS h, " +
      "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
      "AS toks FROM documents), " +
      "spl AS (SELECT doc_id, CASE WHEN b < 204 THEN 'train' " +
      "WHEN b < 230 THEN 'val' ELSE 'test' END AS split FROM " +
      "(SELECT doc_id, " +
      "(strpos('0123456789abcdef', substr(hk, 1, 1)) - 1) * 16 + " +
      "strpos('0123456789abcdef', substr(hk, 2, 1)) - 1 AS b FROM " +
      "(SELECT doc_id, md5('split|' || CAST(doc_id AS VARCHAR)) AS hk " +
      "FROM t))), " +
      "b0 AS (SELECT t.doc_id, t.source, t.h, t.toks, spl.split " +
      "FROM t JOIN spl USING (doc_id)), " +
      "ex AS (SELECT DISTINCT doc_id FROM b0 WHERE split = 'train' " +
      "AND h IN (SELECT h FROM b0 WHERE split <> 'train')), " +
      "g AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
      "range(1, len(toks) - 1), " +
      "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) " +
      "AS gram FROM b0), " +
      "tg AS (SELECT g.doc_id AS train_id, gram FROM g " +
      "JOIN spl ON spl.doc_id = g.doc_id WHERE spl.split = 'train'), " +
      "hg AS (SELECT DISTINCT g.doc_id AS held_id, gram FROM g " +
      "JOIN spl ON spl.doc_id = g.doc_id WHERE spl.split <> 'train'), " +
      "lx AS (SELECT DISTINCT train_id AS doc_id FROM " +
      "(SELECT train_id, held_id FROM tg JOIN hg USING (gram) " +
      "GROUP BY train_id, held_id " +
      "HAVING COUNT(DISTINCT gram) >= 2)), " +
      "s2 AS (SELECT doc_id, list_distinct(list_transform(" +
      "range(1, len(toks) - 1), " +
      "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) " +
      "AS sh FROM b0), " +
      "f2 AS (SELECT * FROM s2 WHERE len(sh) > 0), " +
      "e2 AS (SELECT doc_id, unnest(sh) AS g2 FROM f2), " +
      "sig AS (SELECT doc_id, " +
      "MIN(md5(g2 || '#0')) AS m0, MIN(md5(g2 || '#1')) AS m1, " +
      "MIN(md5(g2 || '#2')) AS m2, MIN(md5(g2 || '#3')) AS m3, " +
      "MIN(md5(g2 || '#4')) AS m4, MIN(md5(g2 || '#5')) AS m5, " +
      "MIN(md5(g2 || '#6')) AS m6, MIN(md5(g2 || '#7')) AS m7 " +
      "FROM e2 GROUP BY doc_id), " +
      "band AS (SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) " +
      "AS bucket FROM sig " +
      "UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM sig " +
      "UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM sig " +
      "UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM sig), " +
      "p AS (SELECT DISTINCT tr.doc_id AS train_id, " +
      "ho.doc_id AS held_id FROM band tr " +
      "JOIN band ho ON tr.band = ho.band AND tr.bucket = ho.bucket " +
      "JOIN spl st ON st.doc_id = tr.doc_id " +
      "JOIN spl s3 ON s3.doc_id = ho.doc_id " +
      "WHERE st.split = 'train' AND s3.split <> 'train'), " +
      "v AS (SELECT train_id, held_id, " +
      "len(list_intersect(a.sh, b.sh)) AS inter, " +
      "len(a.sh) AS la, len(b.sh) AS lb " +
      "FROM p JOIN f2 a ON a.doc_id = p.train_id " +
      "JOIN f2 b ON b.doc_id = p.held_id), " +
      "nr AS (SELECT DISTINCT train_id AS doc_id FROM v " +
      "WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) " +
      ">= 0.5), " +
      "m AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
      "CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) " +
      "AS BIGINT) AS n_train, " +
      "CAST(SUM(CASE WHEN split <> 'train' THEN 1 ELSE 0 END) " +
      "AS BIGINT) AS n_heldout FROM b0 GROUP BY source), " +
      "ce AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM b0 " +
      "WHERE doc_id IN (SELECT doc_id FROM ex) GROUP BY source), " +
      "cl AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM b0 " +
      "WHERE doc_id IN (SELECT doc_id FROM lx) GROUP BY source), " +
      "cn AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM b0 " +
      "WHERE doc_id IN (SELECT doc_id FROM nr) GROUP BY source) " +
      "SELECT m.source, m.n_docs, m.n_train, m.n_heldout, " +
      "CAST(COALESCE(ce.n, 0) AS BIGINT) AS n_exact_leak, " +
      "CAST(COALESCE(cl.n, 0) AS BIGINT) AS n_lex_leak, " +
      "CAST(COALESCE(cn.n, 0) AS BIGINT) AS n_near_leak, " +
      "CASE WHEN m.n_train > 0 THEN CAST(COALESCE(ce.n, 0) AS DOUBLE) " +
      "/ CAST(m.n_train AS DOUBLE) ELSE 0.0 END AS exact_rate, " +
      "CASE WHEN m.n_train > 0 THEN CAST(COALESCE(cl.n, 0) AS DOUBLE) " +
      "/ CAST(m.n_train AS DOUBLE) ELSE 0.0 END AS lex_rate, " +
      "CASE WHEN m.n_train > 0 THEN CAST(COALESCE(cn.n, 0) AS DOUBLE) " +
      "/ CAST(m.n_train AS DOUBLE) ELSE 0.0 END AS near_rate " +
      "FROM m LEFT JOIN ce ON ce.source = m.source " +
      "LEFT JOIN cl ON cl.source = m.source " +
      "LEFT JOIN cn ON cn.source = m.source " +
      "ORDER BY m.source"

  private def q224Sql: String =
      ("WITH t AS (SELECT source, list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '') AS toks " +
        "FROM documents), " +
        "g AS (SELECT DISTINCT source, md5(gram) AS h FROM " +
        "(SELECT source, unnest(list_distinct(list_transform(" +
        "range(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) " +
        "AS gram FROM t)), " +
        "sk AS (SELECT source, h FROM (SELECT source, h, " +
        "ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn " +
        "FROM g) WHERE rn <= 64), " +
        "srcs AS (SELECT DISTINCT source FROM g), " +
        "pr AS (SELECT a.source AS source_a, b.source AS source_b " +
        "FROM srcs a JOIN srcs b ON a.source < b.source), " +
        "m AS (SELECT source_a, source_b, h, MAX(in_a) AS in_a, " +
        "MAX(in_b) AS in_b FROM (" +
        "SELECT pr.source_a, pr.source_b, sk.h, 1 AS in_a, 0 AS in_b " +
        "FROM pr JOIN sk ON sk.source = pr.source_a " +
        "UNION ALL " +
        "SELECT pr.source_a, pr.source_b, sk.h, 0 AS in_a, 1 AS in_b " +
        "FROM pr JOIN sk ON sk.source = pr.source_b) " +
        "GROUP BY source_a, source_b, h), " +
        "tk AS (SELECT * FROM (SELECT m.*, ROW_NUMBER() OVER (" +
        "PARTITION BY source_a, source_b ORDER BY h) AS rn FROM m) " +
        "WHERE rn <= 64), " +
        "est AS (SELECT source_a, source_b, " +
        "CAST(COUNT(*) AS BIGINT) AS k_used, " +
        "CAST(SUM(in_a * in_b) AS BIGINT) AS n_both FROM tk " +
        "GROUP BY source_a, source_b), " +
        // audit half gated to the deterministic doc_id band (the
        // Spark side's auditMod = 5); estimator stays full-corpus
        "ta AS (SELECT source, list_filter(" +
        "string_split_regex(text, '\\s+'), x -> x <> '') AS toks " +
        "FROM documents WHERE doc_id % 5 = 0), " +
        "ga AS (SELECT DISTINCT source, md5(gram) AS h FROM " +
        "(SELECT source, unnest(list_distinct(list_transform(" +
        "range(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) " +
        "AS gram FROM ta)), " +
        "cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM ga " +
        "GROUP BY source), " +
        "itr AS (SELECT a.source AS source_a, b.source AS source_b, " +
        "CAST(COUNT(*) AS BIGINT) AS n_inter FROM ga a " +
        "JOIN ga b ON a.h = b.h AND a.source < b.source " +
        "GROUP BY 1, 2), " +
        "cov AS (SELECT CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 " +
        "ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) " +
        "AS audit_frac FROM documents) " +
        "SELECT e.source_a, e.source_b, e.k_used, e.n_both, " +
        "CAST(e.n_both AS DOUBLE) / CAST(e.k_used AS DOUBLE) " +
        "AS est_jaccard, " +
        "CAST(COALESCE(ca.n, 0) AS BIGINT) AS audit_n_a, " +
        "CAST(COALESCE(cb.n, 0) AS BIGINT) AS audit_n_b, " +
        "CAST(COALESCE(itr.n_inter, 0) AS BIGINT) AS audit_n_inter, " +
        "CASE WHEN COALESCE(ca.n, 0) + COALESCE(cb.n, 0) - " +
        "COALESCE(itr.n_inter, 0) > 0 THEN " +
        "CAST(COALESCE(itr.n_inter, 0) AS DOUBLE) / " +
        "CAST(COALESCE(ca.n, 0) + COALESCE(cb.n, 0) - " +
        "COALESCE(itr.n_inter, 0) AS DOUBLE) ELSE 0.0 END " +
        "AS audit_jaccard, " +
        "abs(CAST(e.n_both AS DOUBLE) / CAST(e.k_used AS DOUBLE) - " +
        "CASE WHEN COALESCE(ca.n, 0) + COALESCE(cb.n, 0) - " +
        "COALESCE(itr.n_inter, 0) > 0 THEN " +
        "CAST(COALESCE(itr.n_inter, 0) AS DOUBLE) / " +
        "CAST(COALESCE(ca.n, 0) + COALESCE(cb.n, 0) - " +
        "COALESCE(itr.n_inter, 0) AS DOUBLE) ELSE 0.0 END) " +
        "AS audit_abs_err, " +
        "cov.audit_frac " +
        "FROM est e LEFT JOIN cnt ca ON ca.source = e.source_a " +
        "LEFT JOIN cnt cb ON cb.source = e.source_b " +
        "LEFT JOIN itr ON itr.source_a = e.source_a " +
        "AND itr.source_b = e.source_b " +
        "CROSS JOIN cov " +
        "ORDER BY e.source_a, e.source_b")

  /** Shared q95-chain prelude: verified minhash pairs `ed(a, b)`, the
    * symmetric edge list `und(u, w)` and per-node degrees `dg(u,
    * degree)` — the graph every dup-graph oracle (q204/q212) peels or
    * profiles.
    */
  /** One synchronous LPA round over the `und` relation: every node
    * adopts its neighbors' most frequent round-(i−1) label, ties to
    * the smallest — the q327 determinism rule.
    */
  private def lpaRounds(k: Int): String =
    (1 to k).map(i =>
      s"n$i AS (SELECT und.u, l${i - 1}.lbl, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt " +
        s"FROM und JOIN l${i - 1} ON und.w = l${i - 1}.u GROUP BY 1, 2), " +
        s"l$i AS (SELECT u, lbl FROM (SELECT u, lbl, " +
        "ROW_NUMBER() OVER (PARTITION BY u ORDER BY cnt DESC, lbl) " +
        s"AS rn FROM n$i) WHERE rn = 1)").mkString(", ")

  private[oracles] def dupGraphCte: String =
    "WITH " + dupGraphCteBody("", "documents")

  /** The q95 banding chain with every CTE name carrying prefix `p`,
    * over an arbitrary base relation — no leading WITH, so two chains
    * (e.g. full corpus vs post-erasure corpus, q390) compose in one
    * statement. `dupGraphCte` is the zero-prefix instance every
    * existing consumer keeps reading verbatim.
    */
  /** Shared shingle→signature→band head: CTEs `${p}t/s/f/e/sig/band`
    * over `base` — the common prefix of the uncapped
    * ([[dupGraphCteBody]]) and capped ([[dupGraphCteBodyCapped]])
    * chains.
    */
  private def bandChainHead(p: String, base: String): String =
    s"${p}t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
      s"x -> x <> '') AS toks FROM $base), " +
      s"${p}s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), " +
      s"i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS sh FROM ${p}t), " +
      s"${p}f AS (SELECT * FROM ${p}s WHERE len(sh) > 0), " +
      s"${p}e AS (SELECT doc_id, unnest(sh) AS g FROM ${p}f), " +
      s"${p}sig AS (SELECT doc_id, " +
      "MIN(md5(g || '#0')) AS m0, MIN(md5(g || '#1')) AS m1, " +
      "MIN(md5(g || '#2')) AS m2, MIN(md5(g || '#3')) AS m3, " +
      "MIN(md5(g || '#4')) AS m4, MIN(md5(g || '#5')) AS m5, " +
      "MIN(md5(g || '#6')) AS m6, MIN(md5(g || '#7')) AS m7 " +
      s"FROM ${p}e GROUP BY doc_id), " +
      s"${p}band AS (SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bucket FROM ${p}sig " +
      s"UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM ${p}sig " +
      s"UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM ${p}sig " +
      s"UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM ${p}sig)"

  /** The q95 chain with the production hot-bucket quarantine spelled
    * out (`HAVING COUNT(*) <= cap` over (band, bucket) — the
    * [[graft.operators.Dedup.BandBucketCap]] discipline, the q241
    * spelling): CTEs through `${p}v` (verification operands) and
    * `${p}ed` (a, b edge pairs at jaccard ≥ 0.5). Used by the
    * incremental-maintenance family (q426/q427), whose contract is
    * exactly the CAPPED chain.
    */
  private[oracles] def dupGraphCteBodyCapped(p: String, base: String,
      cap: Int = 64): String =
    bandChainHead(p, base) + ", " +
      s"${p}keep AS (SELECT band, bucket FROM ${p}band " +
      s"GROUP BY band, bucket HAVING COUNT(*) <= $cap), " +
      s"${p}kb AS (SELECT ${p}band.doc_id, ${p}band.band, ${p}band.bucket " +
      s"FROM ${p}band JOIN ${p}keep ON ${p}band.band = ${p}keep.band " +
      s"AND ${p}band.bucket = ${p}keep.bucket), " +
      s"${p}p AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b " +
      s"FROM ${p}kb l JOIN ${p}kb r ON l.band = r.band AND l.bucket = r.bucket " +
      "WHERE l.doc_id < r.doc_id), " +
      s"${p}v AS (SELECT id_a, id_b, len(list_intersect(a.sh, b.sh)) AS inter, " +
      "len(a.sh) AS la, len(b.sh) AS lb " +
      s"FROM ${p}p JOIN ${p}f a ON a.doc_id = ${p}p.id_a JOIN ${p}f b ON b.doc_id = ${p}p.id_b), " +
      s"${p}ed AS (SELECT id_a AS a, id_b AS b FROM ${p}v " +
      "WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) >= 0.5)"

  private[oracles] def dupGraphCteBody(p: String, base: String): String =
      bandChainHead(p, base) + ", " +
        s"${p}p AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b " +
        s"FROM ${p}band l JOIN ${p}band r ON l.band = r.band AND l.bucket = r.bucket " +
        "WHERE l.doc_id < r.doc_id), " +
        s"${p}v AS (SELECT id_a, id_b, len(list_intersect(a.sh, b.sh)) AS inter, " +
        "len(a.sh) AS la, len(b.sh) AS lb " +
        s"FROM ${p}p JOIN ${p}f a ON a.doc_id = ${p}p.id_a JOIN ${p}f b ON b.doc_id = ${p}p.id_b), " +
        s"${p}ed AS (SELECT id_a AS a, id_b AS b FROM ${p}v " +
        "WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) >= 0.5), " +
        s"${p}und AS (SELECT a AS u, b AS w FROM ${p}ed " +
        s"UNION ALL SELECT b, a FROM ${p}ed), " +
        s"${p}dg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS degree FROM ${p}und " +
        "GROUP BY u)"

  private def q204Sql: String = {
    val prelude = dupGraphCte +
      ", a0 AS MATERIALIZED (SELECT u FROM dg WHERE degree >= 2)"
    // MATERIALIZED is load-bearing: each round references the previous
    // one twice (both join sides), so plain CTE inlining would copy the
    // whole chain 2^rounds times
    val rounds = (1 to KCoreRounds).map { i =>
      s"a$i AS MATERIALIZED (SELECT e.u FROM und e " +
        s"JOIN a${i - 1} x ON x.u = e.u JOIN a${i - 1} y ON y.u = e.w " +
        "GROUP BY e.u HAVING COUNT(*) >= 2)"
    }.mkString(", ", ", ", "")
    val core =
      s", cd AS (SELECT e.u, CAST(COUNT(*) AS BIGINT) AS core_degree " +
        s"FROM und e JOIN a$KCoreRounds x ON x.u = e.u " +
        s"JOIN a$KCoreRounds y ON y.u = e.w GROUP BY e.u) " +
        "SELECT dg.u AS doc_id, dg.degree, " +
        "CAST(CASE WHEN cd.u IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_core, " +
        "CAST(COALESCE(cd.core_degree, 0) AS BIGINT) AS core_degree " +
        "FROM dg LEFT JOIN cd ON cd.u = dg.u ORDER BY doc_id"
    prelude + rounds + core
  }

  // q212: degree histogram + degree assortativity. Over the symmetric
  // edge list Σdu = Σdv and Σdu² = Σdv², so Pearson reduces to ONE
  // final division over integer sums — exact cross-engine
  private def q212Sql: String =
    dupGraphCte +
      ", hist AS (SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes " +
      "FROM dg GROUP BY degree), " +
      "tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM dg), " +
      "ej AS (SELECT d1.degree AS du, d2.degree AS dv FROM und " +
      "JOIN dg d1 ON d1.u = und.u JOIN dg d2 ON d2.u = und.w), " +
      "sm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, " +
      "CAST(SUM(du) AS BIGINT) AS sj, " +
      "CAST(SUM(du * du) AS BIGINT) AS sjj, " +
      "CAST(SUM(du * dv) AS BIGINT) AS sjk FROM ej) " +
      "SELECT hist.degree, hist.n_nodes, " +
      "CAST(hist.n_nodes AS DOUBLE) / CAST(tt.n_total AS DOUBLE) AS frac, " +
      "CASE WHEN sm.m * sm.sjj - sm.sj * sm.sj = 0 THEN 0.0 ELSE " +
      "CAST(sm.m * sm.sjk - sm.sj * sm.sj AS DOUBLE) / " +
      "CAST(sm.m * sm.sjj - sm.sj * sm.sj AS DOUBLE) END AS assort " +
      "FROM hist CROSS JOIN tt CROSS JOIN sm ORDER BY hist.degree"

  /** The q193 chain up to `cl(id, cluster)` — the recursive min-label
    * closure over the verified dup edges, reused by the split-hygiene
    * family (q362) for its group-safe assignment grain. Intermediate
    * CTEs `pj` (directed verified pairs, id_a < id_b) and `e2`
    * (symmetric) are part of the reusable surface.
    */
  private[oracles] def q193ClusterCtes: String =
      ("WITH RECURSIVE t AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
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
        "p AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b " +
        "FROM band l JOIN band r ON l.band = r.band AND l.bucket = r.bucket " +
        "WHERE l.doc_id < r.doc_id), " +
        "v AS (SELECT id_a, id_b, len(list_intersect(a.sh, b.sh)) AS inter, " +
        "len(a.sh) AS la, len(b.sh) AS lb " +
        "FROM p JOIN f a ON a.doc_id = p.id_a JOIN f b ON b.doc_id = p.id_b), " +
        "pj AS (SELECT id_a, id_b FROM v " +
        "WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) >= 0.5), " +
        "e2 AS (SELECT id_a AS a, id_b AS b FROM pj " +
        "UNION ALL SELECT id_b, id_a FROM pj), " +
        "lab AS (SELECT doc_id AS id, doc_id AS lbl FROM documents " +
        "UNION SELECT e2.a, lab.lbl FROM lab, e2 WHERE lab.id = e2.b), " +
        "cl AS (SELECT id, MIN(lbl) AS cluster FROM lab GROUP BY id)")

  private def q193Sql: String =
      (q193ClusterCtes +
        " SELECT d.doc_id, cl.cluster, " +
        "CAST(COUNT(*) OVER (PARTITION BY cl.cluster) AS BIGINT) " +
        "AS n_members " +
        "FROM documents d JOIN cl ON cl.id = d.doc_id ORDER BY d.doc_id")

  /** q175: q174's screen plus the stream-state rule — a batch window
    * is borrowed when it appears in the corpus OR in a stream doc with
    * a smaller doc_id (first occurrence wins; same-doc repeats never
    * self-remove). Matches the drained stream under the id-ordered
    * arrival contract the operator documents.
    */
  private def q175Sql: String =
    ("WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
      "x -> x <> '') AS toks FROM documents), " +
      "f AS (SELECT * FROM t WHERE len(toks) > 0), " +
      "w AS (SELECT doc_id, p AS pos, " +
      "md5(array_to_string(toks[p+1:p+15], ' ')) AS wh " +
      "FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - 14)) AS p " +
      "FROM f WHERE len(toks) >= 15)), " +
      "cw AS (SELECT DISTINCT wh, 1 AS inc FROM w WHERE doc_id % 10 <> 9), " +
      "sw AS (SELECT wh, MIN(doc_id) AS mind FROM w " +
      "WHERE doc_id % 10 = 9 GROUP BY wh), " +
      "rem AS (SELECT w.doc_id, list(pos ORDER BY pos) AS starts, " +
      "COUNT(*) AS n_dup FROM w " +
      "LEFT JOIN cw USING (wh) LEFT JOIN sw USING (wh) " +
      "WHERE w.doc_id % 10 = 9 " +
      "AND (cw.inc IS NOT NULL OR sw.mind < w.doc_id) " +
      "GROUP BY w.doc_id), " +
      "j AS (SELECT f.doc_id, toks, " +
      "COALESCE(starts, CAST([] AS BIGINT[])) AS starts, " +
      "COALESCE(n_dup, 0) AS n_dup FROM f " +
      "LEFT JOIN rem ON f.doc_id = rem.doc_id " +
      "WHERE f.doc_id % 10 = 9), " +
      "k AS (SELECT doc_id, toks, n_dup, " +
      "list_filter(range(0, len(toks)), tk -> " +
      "len(list_filter(starts, s -> s <= tk AND tk < s + 15)) = 0) " +
      "AS kept FROM j) " +
      "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, " +
      "CAST(greatest(len(toks) - 14, 0) AS BIGINT) AS n_windows, " +
      "CAST(n_dup AS BIGINT) AS n_dup_windows, " +
      "CAST(len(kept) AS BIGINT) AS n_kept_tokens, " +
      "CAST(len(kept) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS keep_ratio, " +
      "md5(COALESCE(array_to_string(" +
      "list_transform(kept, tk -> toks[CAST(tk + 1 AS INT)]), ' '), '')) " +
      "AS kept_md5 " +
      "FROM k ORDER BY doc_id")

  private def q174Sql: String =
    ("WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
      "x -> x <> '') AS toks FROM documents), " +
      "f AS (SELECT * FROM t WHERE len(toks) > 0), " +
      "w AS (SELECT doc_id, p AS pos, " +
      "md5(array_to_string(toks[p+1:p+15], ' ')) AS wh " +
      "FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - 14)) AS p " +
      "FROM f WHERE len(toks) >= 15)), " +
      "cw AS (SELECT DISTINCT wh FROM w WHERE doc_id % 10 <> 9), " +
      "rem AS (SELECT doc_id, list(pos ORDER BY pos) AS starts, " +
      "COUNT(*) AS n_dup FROM w JOIN cw USING (wh) " +
      "WHERE doc_id % 10 = 9 GROUP BY doc_id), " +
      "j AS (SELECT f.doc_id, toks, " +
      "COALESCE(starts, CAST([] AS BIGINT[])) AS starts, " +
      "COALESCE(n_dup, 0) AS n_dup FROM f " +
      "LEFT JOIN rem ON f.doc_id = rem.doc_id " +
      "WHERE f.doc_id % 10 = 9), " +
      "k AS (SELECT doc_id, toks, n_dup, " +
      "list_filter(range(0, len(toks)), tk -> " +
      "len(list_filter(starts, s -> s <= tk AND tk < s + 15)) = 0) " +
      "AS kept FROM j) " +
      "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, " +
      "CAST(greatest(len(toks) - 14, 0) AS BIGINT) AS n_windows, " +
      "CAST(n_dup AS BIGINT) AS n_dup_windows, " +
      "CAST(len(kept) AS BIGINT) AS n_kept_tokens, " +
      "CAST(len(kept) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS keep_ratio, " +
      "md5(COALESCE(array_to_string(" +
      "list_transform(kept, tk -> toks[CAST(tk + 1 AS INT)]), ' '), '')) " +
      "AS kept_md5 " +
      "FROM k ORDER BY doc_id")
}
