package graft.oracles

/** DuckDB oracle SQL — embedding similarity / ANN / k-means family.
  *
  * Split out of `graft.Registry` (which had grown past 1,900 lines);
  * `Registry.oracleSql` merges the per-family maps and asserts key
  * disjointness. Entry text is unchanged — column aliases and total-
  * order sorts still mirror the Spark queries exactly.
  */
private[graft] object OracleAnn {

  /** MMR oracle step builder (q154): step n scores every remaining
    * candidate as λ·dot(v, q) − (1−λ)·GREATEST(dot(v, m_j)) over the
    * already-selected m_1..m_{n−1}, and takes the fixed-point-rounded
    * argmax with ties to the lowest vec_id — the engine's greedy loop,
    * unrolled. (1−λ) is spelled `(1.0 - 0.7)` so both engines perform
    * the same IEEE subtraction rather than parsing different decimal
    * literals.
    */
  private def mmrDot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), pr -> pr[1] * pr[2]), " +
      "(x, y) -> x + y)"

  private def mmrStep(n: Int): String = {
    val sims = (1 until n).map(j => mmrDot("c.v", s"m$j.v"))
    val maxSim =
      if (sims.isEmpty) "0.0" else s"GREATEST(${sims.mkString(", ")})"
    val joins = (1 until n).map(j => s"CROSS JOIN m$j").mkString(" ")
    val notPrev = (1 until n).map(j => s"AND c.vec_id <> m$j.vec_id")
      .mkString(" ")
    val score = s"0.7 * ${mmrDot("c.v", "qv.v")} - (1.0 - 0.7) * $maxSim"
    s"m$n AS (SELECT * FROM (SELECT c.vec_id AS vec_id, c.v AS v, " +
      s"$score AS score FROM cand c CROSS JOIN qv $joins " +
      s"WHERE 1 = 1 $notPrev) " +
      "ORDER BY CAST(floor(score * 1e9 + 0.5) AS BIGINT) DESC, vec_id " +
      "LIMIT 1)"
  }

  /** k-means oracle CTE builders (q124): the Euclidean assignment
    * argmax(v·c − ‖c‖²/2) with ties to the lowest cid, and the
    * fixed-point centroid update — both folds ordered to match the
    * engine's kernels exactly.
    */
  private def kmScore: String =
    "list_reduce(list_transform(list_zip(e.v, c.c), z -> z[1]*z[2]), " +
      "(a,b) -> a+b) - " +
      "list_reduce(list_transform(c.c, x -> x*x), (a,b) -> a+b)/2"

  private def kmAssign(prev: String, name: String,
      withScore: Boolean): String = {
    val scoreCol = if (withScore) s", $kmScore AS score" else ""
    val outCol = if (withScore) ", score" else ""
    s"$name AS (SELECT vec_id, cid$outCol FROM (" +
      s"SELECT e.vec_id, c.cid$scoreCol, ROW_NUMBER() OVER (" +
      s"PARTITION BY e.vec_id ORDER BY $kmScore DESC, c.cid ASC) AS rn " +
      s"FROM e CROSS JOIN $prev c) WHERE rn = 1)"
  }

  private def kmUpdate(asn: String, prev: String, xn: String,
      cn: String): String =
    s"$xn AS (SELECT $asn.cid, d.i, " +
      "CAST(SUM(CAST(floor(e.v[CAST(d.i AS INT)] * 1e12 + 0.5) AS BIGINT)) " +
      s"AS DOUBLE)/1e12/COUNT(*) AS cv FROM $asn JOIN e USING (vec_id), " +
      s"range(1, 65) d(i) GROUP BY $asn.cid, d.i), " +
      s"$cn AS (SELECT p.cid, COALESCE(l.c, p.c) AS c FROM $prev p " +
      "LEFT JOIN (SELECT cid, list(cv ORDER BY i) AS c FROM " +
      s"$xn GROUP BY cid) l ON p.cid = l.cid)"

  val sql: Map[String, String] = Map(
    "q30_embedding_stats" ->
      ("SELECT label, COUNT(*) AS n_vectors, " +
        "CAST(MIN(len(embedding)) AS BIGINT) AS min_dim, " +
        "CAST(MAX(len(embedding)) AS BIGINT) AS max_dim, " +
        "MIN(vec_id) AS min_vec_id FROM embeddings GROUP BY label ORDER BY label"),
    // FP accumulation parity: DuckDB list_reduce is a left fold whose
    // first step (x1, then acc+x2...) equals Spark's 0.0-seeded fold
    // bit-for-bit (0.0+x1 == x1 in IEEE), so the normalized vectors and
    // the cosine scores match the native kernel exactly — verified
    // bit-identical at sf0.01, not just round-9-identical.
    "q34_ann_bruteforce" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0 " +
        "FROM embeddings), " +
        "u AS (SELECT vec_id, list_transform(v0, x -> x / " +
        "sqrt(list_reduce(list_transform(v0, y -> y*y), (a,b) -> a+b))) AS v FROM e), " +
        "q AS (SELECT vec_id AS q_id, v AS q_v FROM u WHERE vec_id < 5), " +
        "scored AS (SELECT q.q_id, u.vec_id AS neighbor, " +
        "list_reduce(list_transform(list_zip(u.v, q.q_v), p -> p[1] * p[2]), (a,b) -> a+b) AS cos " +
        "FROM u JOIN q ON u.vec_id <> q.q_id), " +
        "ranked AS (SELECT q_id, neighbor, cos, " +
        "row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor ASC) AS rnk FROM scored) " +
        "SELECT q_id, CAST(rnk AS BIGINT) AS rank, neighbor, cos FROM ranked " +
        "WHERE rnk <= 5 ORDER BY q_id, rank"),
    // q237: the q169 chain with a SPLIT predicate instead of the batch
    // split — held-out (vec_id % 5 = 0) screened against train through
    // the coarse-quantizer lists; the embedding member of the
    // decontamination family
    "q237_embedding_decontamination" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0 " +
        "FROM embeddings WHERE vec_id < 5000), " +
        "u AS (SELECT vec_id, list_transform(v0, x -> x / " +
        "sqrt(list_reduce(list_transform(v0, y -> y*y), (a,b) -> a+b))) AS v FROM e), " +
        "c AS (SELECT vec_id AS cid, v AS cv FROM u WHERE vec_id < 8), " +
        "s AS (SELECT u.vec_id, c.cid, " +
        "list_reduce(list_transform(list_zip(u.v, c.cv), p -> p[1] * p[2]), (x,y) -> x+y) AS sim " +
        "FROM u CROSS JOIN c), " +
        "asn AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM s) " +
        "WHERE rn = 1), " +
        "m AS (SELECT asn.vec_id, asn.cid, u.v FROM asn JOIN u USING (vec_id)), " +
        "b AS (SELECT * FROM m WHERE vec_id % 5 = 0), " +
        "cr AS (SELECT cid, vec_id AS train_id, v AS tv FROM m " +
        "WHERE vec_id % 5 <> 0), " +
        "p AS (SELECT b.vec_id, b.cid, cr.train_id, " +
        "list_reduce(list_transform(list_zip(b.v, cr.tv), pr -> pr[1] * pr[2]), (x,y) -> x+y) AS sim " +
        "FROM b JOIN cr ON b.cid = cr.cid), " +
        "h AS (SELECT vec_id, COUNT(*) AS n_near_train FROM p " +
        "WHERE sim >= 0.3 GROUP BY vec_id), " +
        "bst AS (SELECT vec_id, train_id AS best_train, sim AS best_sim FROM " +
        "(SELECT vec_id, train_id, sim, ROW_NUMBER() OVER " +
        "(PARTITION BY vec_id ORDER BY sim DESC, train_id) AS rn " +
        "FROM p WHERE sim >= 0.3) WHERE rn = 1) " +
        "SELECT b.vec_id, b.cid, " +
        "CAST(COALESCE(h.n_near_train, 0) AS BIGINT) AS n_near_train, " +
        "CAST(CASE WHEN bst.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS leaked, " +
        "bst.best_train, bst.best_sim " +
        "FROM b LEFT JOIN h ON h.vec_id = b.vec_id " +
        "LEFT JOIN bst ON bst.vec_id = b.vec_id ORDER BY b.vec_id"),
    // q238: the q237 leak set folded into q218's repair policy —
    // leaked held-out vectors reassigned to train, per-split audit
    "q238_embedding_leak_repair" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0 " +
        "FROM embeddings WHERE vec_id < 5000), " +
        "u AS (SELECT vec_id, list_transform(v0, x -> x / " +
        "sqrt(list_reduce(list_transform(v0, y -> y*y), (a,b) -> a+b))) AS v FROM e), " +
        "c AS (SELECT vec_id AS cid, v AS cv FROM u WHERE vec_id < 8), " +
        "s AS (SELECT u.vec_id, c.cid, " +
        "list_reduce(list_transform(list_zip(u.v, c.cv), p -> p[1] * p[2]), (x,y) -> x+y) AS sim " +
        "FROM u CROSS JOIN c), " +
        "asn AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM s) " +
        "WHERE rn = 1), " +
        "m AS (SELECT asn.vec_id, asn.cid, u.v FROM asn JOIN u USING (vec_id)), " +
        "b AS (SELECT * FROM m WHERE vec_id % 5 = 0), " +
        "cr AS (SELECT cid, vec_id AS train_id, v AS tv FROM m " +
        "WHERE vec_id % 5 <> 0), " +
        "p AS (SELECT b.vec_id, cr.train_id, " +
        "list_reduce(list_transform(list_zip(b.v, cr.tv), pr -> pr[1] * pr[2]), (x,y) -> x+y) AS sim " +
        "FROM b JOIN cr ON b.cid = cr.cid), " +
        "lk AS (SELECT DISTINCT vec_id FROM p WHERE sim >= 0.3), " +
        "al AS (SELECT vec_id, CASE WHEN vec_id % 5 = 0 THEN 'heldout' " +
        "ELSE 'train' END AS split FROM embeddings WHERE vec_id < 5000), " +
        "bf AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_before " +
        "FROM al GROUP BY split), " +
        "mo AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_out FROM al " +
        "WHERE vec_id IN (SELECT vec_id FROM lk) GROUP BY split), " +
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nl FROM lk) " +
        "SELECT bf.split, n_before, " +
        "CAST(COALESCE(mo.n_out, 0) AS BIGINT) AS n_moved_out, " +
        "CAST(CASE WHEN bf.split = 'train' THEN tot.nl ELSE 0 END " +
        "AS BIGINT) AS n_moved_in, " +
        "CAST(n_before - COALESCE(mo.n_out, 0) + " +
        "CASE WHEN bf.split = 'train' THEN tot.nl ELSE 0 END " +
        "AS BIGINT) AS n_after " +
        "FROM bf LEFT JOIN mo ON mo.split = bf.split CROSS JOIN tot " +
        "ORDER BY bf.split"),
    // q232: q34's brute-force top-k with the corpus side constrained
    // to label = 3 — the filtered vector search every production
    // store serves; same FP-parity argument, predicate in the scan
    "q232_filtered_ann" ->
      ("WITH e AS (SELECT vec_id, label, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0 " +
        "FROM embeddings), " +
        "u AS (SELECT vec_id, label, list_transform(v0, x -> x / " +
        "sqrt(list_reduce(list_transform(v0, y -> y*y), (a,b) -> a+b))) AS v FROM e), " +
        "q AS (SELECT vec_id AS q_id, v AS q_v FROM u WHERE vec_id < 5), " +
        "scored AS (SELECT q.q_id, u.vec_id AS neighbor, u.label, " +
        "list_reduce(list_transform(list_zip(u.v, q.q_v), p -> p[1] * p[2]), (a,b) -> a+b) AS cos " +
        "FROM u JOIN q ON u.vec_id <> q.q_id WHERE u.label = 3), " +
        "ranked AS (SELECT q_id, neighbor, label, cos, " +
        "row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor ASC) AS rnk FROM scored) " +
        "SELECT q_id, CAST(rnk AS BIGINT) AS rank, neighbor, " +
        "CAST(label AS BIGINT) AS label, cos FROM ranked " +
        "WHERE rnk <= 5 ORDER BY q_id, rank"),
    "q70_embedding_quantize" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "s AS (SELECT vec_id, v, 127.0 / list_max(list_transform(v, " +
        "x -> abs(x))) AS scale FROM e), " +
        "q AS (SELECT vec_id, v, scale, list_transform(v, " +
        "x -> CAST(round(x * scale) AS INT)) AS qv FROM s) " +
        "SELECT vec_id, scale, CAST(len(qv) AS BIGINT) AS n_dims, " +
        "CAST(list_sum(qv) AS BIGINT) AS sum_q, " +
        "list_max(list_transform(range(1, len(v) + 1), " +
        "i -> abs(v[i] - CAST(qv[i] AS DOUBLE) / scale))) AS max_abs_err " +
        "FROM q ORDER BY vec_id"),
    // same FP-parity argument as q34: list_reduce left fold == Spark's
    // 0.0-seeded fold bit-for-bit
    // the vec_id < 2000 cap keeps the exactness baseline's all-pairs
    // space structurally bounded (≤200 sampled vectors) at any corpus
    // size — a no-op at the 500-vector correctness fixtures
    "q91_cosine_neardup_exact" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0 " +
        "FROM embeddings WHERE vec_id % 10 = 0 AND vec_id < 2000), " +
        "u AS (SELECT vec_id, list_transform(v0, x -> x / " +
        "sqrt(list_reduce(list_transform(v0, y -> y*y), (a,b) -> a+b))) AS v FROM e) " +
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        "list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]), (x,y) -> x+y) AS cos " +
        "FROM u a JOIN u b ON a.vec_id < b.vec_id " +
        "WHERE list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]), (x,y) -> x+y) >= 0.3 " +
        "ORDER BY id_a, id_b"),
    // cosines via list_reduce left fold == Spark's 0.0-seeded fold
    // bit-for-bit (q34 argument); argmax ties break to the lowest cid in
    // both engines (Spark max(struct(sim, -cid)) vs ORDER BY sim DESC, cid)
    // vec_id < 5000 mirrors the engine's structural cap on the oracle
    // twin (k is SQL-pinned at 8, so pair work is n²/16 — bounded here;
    // no-op at the ≤500-vector fixtures; q118 is the uncapped path)
    "q97_semdedup" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0 " +
        "FROM embeddings WHERE vec_id < 5000), " +
        "u AS (SELECT vec_id, list_transform(v0, x -> x / " +
        "sqrt(list_reduce(list_transform(v0, y -> y*y), (a,b) -> a+b))) AS v FROM e), " +
        "c AS (SELECT vec_id AS cid, v AS cv FROM u WHERE vec_id < 8), " +
        "s AS (SELECT u.vec_id, c.cid, " +
        "list_reduce(list_transform(list_zip(u.v, c.cv), p -> p[1] * p[2]), (x,y) -> x+y) AS sim " +
        "FROM u CROSS JOIN c), " +
        "asn AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM s) " +
        "WHERE rn = 1), " +
        "m AS (SELECT asn.vec_id, asn.cid, u.v FROM asn JOIN u USING (vec_id)), " +
        "d AS (SELECT DISTINCT a.vec_id FROM m a JOIN m b " +
        "ON a.cid = b.cid AND b.vec_id < a.vec_id " +
        "WHERE list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]), (x,y) -> x+y) >= 0.3) " +
        "SELECT m.vec_id, m.cid, " +
        "CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept " +
        "FROM m LEFT JOIN d ON d.vec_id = m.vec_id ORDER BY m.vec_id"),
    // q169: the q97 chain with the corpus/batch split — batch vectors
    // compare only to corpus members of their own cluster; best match
    // by (sim DESC, other) is deterministic by the q34 bit-identical-
    // dot argument; vec_id < 5000 mirrors the engine's structural cap
    "q169_incremental_semdedup" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0 " +
        "FROM embeddings WHERE vec_id < 5000), " +
        "u AS (SELECT vec_id, list_transform(v0, x -> x / " +
        "sqrt(list_reduce(list_transform(v0, y -> y*y), (a,b) -> a+b))) AS v FROM e), " +
        "c AS (SELECT vec_id AS cid, v AS cv FROM u WHERE vec_id < 8), " +
        "s AS (SELECT u.vec_id, c.cid, " +
        "list_reduce(list_transform(list_zip(u.v, c.cv), p -> p[1] * p[2]), (x,y) -> x+y) AS sim " +
        "FROM u CROSS JOIN c), " +
        "asn AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM s) " +
        "WHERE rn = 1), " +
        "m AS (SELECT asn.vec_id, asn.cid, u.v FROM asn JOIN u USING (vec_id)), " +
        "b AS (SELECT * FROM m WHERE vec_id % 10 = 9), " +
        // other side = corpus members PLUS earlier-id batch members
        // (the q116 state-append rule in embedding space — new-vs-new
        // duplicates screen too, first occurrence wins)
        "cr AS (SELECT cid, vec_id AS other, v AS cv FROM m), " +
        "p AS (SELECT b.vec_id, b.cid, cr.other, " +
        "list_reduce(list_transform(list_zip(b.v, cr.cv), pr -> pr[1] * pr[2]), (x,y) -> x+y) AS sim " +
        "FROM b JOIN cr ON b.cid = cr.cid " +
        "AND (cr.other % 10 <> 9 OR cr.other < b.vec_id)), " +
        "h AS (SELECT vec_id, COUNT(*) AS n_dups FROM p WHERE sim >= 0.3 " +
        "GROUP BY vec_id), " +
        "bst AS (SELECT vec_id, other AS best_match, sim AS best_sim FROM " +
        "(SELECT vec_id, other, sim, ROW_NUMBER() OVER " +
        "(PARTITION BY vec_id ORDER BY sim DESC, other) AS rn " +
        "FROM p WHERE sim >= 0.3) WHERE rn = 1) " +
        "SELECT b.vec_id, b.cid, " +
        "CAST(COALESCE(h.n_dups, 0) AS BIGINT) AS n_dups, " +
        "CAST(CASE WHEN bst.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup, " +
        "bst.best_match, bst.best_sim " +
        "FROM b LEFT JOIN h ON h.vec_id = b.vec_id " +
        "LEFT JOIN bst ON bst.vec_id = b.vec_id ORDER BY b.vec_id"),
    // long fixed-point element-sums at 1e12 make the FP mean exact and
    // order-independent in both engines (float mantissa 24 bits +
    // 5^12's 28 bits = 52 <= 53, so x*1e12 is an exact double and both
    // engines floor it to the same integer); the norm's left fold
    // matches Spark's 0.0-seeded aggregate bit-for-bit (q34 argument)
    "q104_label_centroids" -> q104Sql,
    // q267: q104 per micro-batch (gated fixed-point-sum ledger) —
    // shares q104's oracle verbatim
    "q267_streaming_label_centroids" -> q104Sql,
    // prototypes exact by the q104 argument; dots fold left-to-right
    // over identical doubles; argmax ties break to the lowest label in
    // both engines
    "q105_centroid_classify" ->
      ("WITH p AS (SELECT unnest(range(1, 65)) AS pos), " +
        "e AS (SELECT label, pos, " +
        "CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1000000000000.0 + 0.5) AS BIGINT) AS x " +
        "FROM embeddings, p), " +
        "g AS (SELECT label, pos, " +
        "CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) / 1000000000000.0 / COUNT(*) AS m " +
        "FROM e GROUP BY label, pos), " +
        "a AS (SELECT label AS clabel, list(m ORDER BY pos) AS cent " +
        "FROM g GROUP BY label), " +
        "u AS (SELECT vec_id, label, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
        "FROM embeddings), " +
        "s AS (SELECT u.vec_id, u.label, a.clabel, " +
        "list_reduce(list_transform(list_zip(u.v, a.cent), " +
        "pr -> pr[1] * pr[2]), (x, y) -> x + y) AS sim " +
        "FROM u CROSS JOIN a), " +
        "b AS (SELECT vec_id, label, clabel, ROW_NUMBER() OVER " +
        "(PARTITION BY vec_id ORDER BY sim DESC, clabel) AS rn FROM s) " +
        "SELECT CAST(label AS BIGINT) AS label, " +
        "CAST(clabel AS BIGINT) AS pred, COUNT(*) AS n " +
        "FROM b WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2"),
    // fixed md5-derived codebooks: component (b,c,j) = (nibble-8)/16,
    // exact in double; nearest-L2 encode ties to the lowest codeword
    // (ROW_NUMBER ORDER BY d, c) and both engines fold the squared
    // distance and per-subspace ADC subtotals left-to-right from 0.0,
    // so scores hash-match bit-for-bit (q34/q102 argument)
    "q113_pq_oracled" ->
      ("WITH cbv AS (SELECT b, c, jj, " +
        "CAST(strpos('0123456789abcdef', substr(md5('cb|' || " +
        "CAST(b AS VARCHAR) || '|' || CAST(c AS VARCHAR) || '|' || " +
        "CAST(jj AS VARCHAR)), 1, 1)) - 9 AS DOUBLE) / 16.0 AS val " +
        "FROM range(0, 8) t1(b), range(0, 4) t2(c), range(0, 8) t3(jj)), " +
        "cb AS (SELECT b, c, list(val ORDER BY jj) AS w FROM cbv " +
        "GROUP BY b, c), " +
        "v AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
        "FROM embeddings), " +
        "sub AS (SELECT vec_id, b, " +
        "list_slice(v, CAST(b * 8 + 1 AS INTEGER), CAST(b * 8 + 8 AS INTEGER)) AS vs " +
        "FROM v, range(0, 8) t(b)), " +
        "dist AS (SELECT vec_id, sub.b, cb.c, " +
        "list_reduce(list_transform(range(1, 9), i -> " +
        "(vs[CAST(i AS INTEGER)] - w[CAST(i AS INTEGER)]) * " +
        "(vs[CAST(i AS INTEGER)] - w[CAST(i AS INTEGER)])), " +
        "(acc, y) -> acc + y) AS d " +
        "FROM sub JOIN cb ON sub.b = cb.b), " +
        "code AS (SELECT vec_id, b, c FROM (SELECT vec_id, b, c, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id, b ORDER BY d, c) AS rn " +
        "FROM dist) WHERE rn = 1), " +
        "qs AS (SELECT vec_id AS q_id, v AS qv FROM v WHERE vec_id < 5), " +
        "ss AS (SELECT qs.q_id, cd.vec_id, cd.b, " +
        "list_reduce(list_transform(list_zip(" +
        "list_slice(qs.qv, CAST(cd.b * 8 + 1 AS INTEGER), CAST(cd.b * 8 + 8 AS INTEGER)), cb.w), " +
        "pr -> pr[1] * pr[2]), (acc, y) -> acc + y) AS s " +
        "FROM code cd JOIN cb ON cd.b = cb.b AND cd.c = cb.c " +
        "CROSS JOIN qs WHERE cd.vec_id <> qs.q_id), " +
        "adc AS (SELECT q_id, vec_id, " +
        "list_reduce(list(s ORDER BY b), (acc, y) -> acc + y) AS adc " +
        "FROM ss GROUP BY q_id, vec_id), " +
        "rk AS (SELECT q_id, vec_id AS neighbor, adc, " +
        "ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id) " +
        "AS rank FROM adc) " +
        "SELECT q_id, CAST(rank AS BIGINT) AS rank, neighbor, adc " +
        "FROM rk WHERE rank <= 5 ORDER BY q_id, rank"),
    // md5-nibble centroids (the q113 trick); argmax-dot assignment with
    // ties to the lowest cid == the NearestCentroid kernel ordering
    "q120_ivf_oracled" ->
      ("WITH cv AS (SELECT c, d, " +
        "CAST(strpos('0123456789abcdef', substr(md5('iv|' || " +
        "CAST(c AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 1)) - 9 " +
        "AS DOUBLE) / 16.0 AS val " +
        "FROM range(0, 4) t1(c), range(0, 64) t2(d)), " +
        "cent AS (SELECT c, list(val ORDER BY d) AS w FROM cv GROUP BY c), " +
        "v AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
        "FROM embeddings), " +
        "s AS (SELECT vec_id, c, " +
        "list_reduce(list_transform(list_zip(v, w), pr -> pr[1] * pr[2]), " +
        "(acc, y) -> acc + y) AS s FROM v CROSS JOIN cent), " +
        "a AS (SELECT vec_id, c AS cid FROM (SELECT vec_id, c, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, c) AS rn " +
        "FROM s) WHERE rn = 1), " +
        "q AS (SELECT vec_id AS q_id, v AS qv FROM v WHERE vec_id < 5), " +
        "qp AS (SELECT q_id, cid FROM (SELECT q.q_id, s.c AS cid, " +
        "ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY s.s DESC, s.c) AS rn " +
        "FROM q JOIN s ON s.vec_id = q.q_id) WHERE rn <= 2), " +
        "cand AS (SELECT qp.q_id, a.vec_id FROM qp JOIN a ON a.cid = qp.cid " +
        "WHERE a.vec_id <> qp.q_id), " +
        "sc AS (SELECT cand.q_id, cand.vec_id, " +
        "list_reduce(list_transform(list_zip(q.qv, v.v), pr -> pr[1] * pr[2]), " +
        "(acc, y) -> acc + y) AS score " +
        "FROM cand JOIN q ON q.q_id = cand.q_id " +
        "JOIN v ON v.vec_id = cand.vec_id), " +
        "rk AS (SELECT q_id, vec_id AS neighbor, score, " +
        "ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) " +
        "AS rank FROM sc) " +
        "SELECT q_id, CAST(rank AS BIGINT) AS rank, neighbor, score " +
        "FROM rk WHERE rank <= 5 ORDER BY q_id, rank"),
    // md5-nibble planes; bucket = bit-packed signs of unit-vector
    // projections; cosine spelling matches q91's left-fold
    "q121_lsh_oracled" ->
      ("WITH pv AS (SELECT p, d, " +
        "CAST(strpos('0123456789abcdef', substr(md5('pl|' || " +
        "CAST(p AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 1)) - 9 " +
        "AS DOUBLE) / 16.0 AS val " +
        "FROM range(0, 6) t1(p), range(0, 64) t2(d)), " +
        "pl AS (SELECT p, list(val ORDER BY d) AS w FROM pv GROUP BY p), " +
        "e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0 " +
        "FROM embeddings WHERE vec_id < 2000), " +
        "u AS (SELECT vec_id, list_transform(v0, x -> x / " +
        "sqrt(list_reduce(list_transform(v0, y -> y*y), (a,b) -> a+b))) AS v " +
        "FROM e), " +
        "pr AS (SELECT vec_id, p, " +
        "list_reduce(list_transform(list_zip(v, w), z -> z[1] * z[2]), " +
        "(a, b) -> a + b) AS s FROM u CROSS JOIN pl), " +
        "b AS (SELECT vec_id, CAST(SUM(CASE WHEN s > 0 THEN " +
        "(CAST(1 AS BIGINT) << CAST(p AS INTEGER)) ELSE 0 END) AS BIGINT) " +
        "AS bucket FROM pr GROUP BY vec_id), " +
        "j AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b " +
        "FROM b a JOIN b b2 ON a.bucket = b2.bucket " +
        "AND a.vec_id < b2.vec_id) " +
        "SELECT id_a, id_b, " +
        "list_reduce(list_transform(list_zip(ua.v, ub.v), z -> z[1] * z[2]), " +
        "(a, b) -> a + b) AS cos " +
        "FROM j JOIN u ua ON ua.vec_id = j.id_a " +
        "JOIN u ub ON ub.vec_id = j.id_b " +
        "WHERE list_reduce(list_transform(list_zip(ua.v, ub.v), " +
        "z -> z[1] * z[2]), (a, b) -> a + b) >= 0.4 " +
        "ORDER BY id_a, id_b"),
    // two unrolled Lloyd rounds; see kmAssign/kmUpdate for the
    // fold-order and fixed-point exactness contract
    "q124_kmeans" ->
      ("WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
        "FROM embeddings WHERE vec_id < 2000), " +
        "c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < 8), " +
        kmAssign("c0", "a1", withScore = false) + ", " +
        kmUpdate("a1", "c0", "x1", "c1") + ", " +
        kmAssign("c1", "a2", withScore = false) + ", " +
        kmUpdate("a2", "c1", "x2", "c2") + ", " +
        kmAssign("c2", "a3", withScore = true) +
        " SELECT vec_id, cid, score FROM a3 ORDER BY vec_id"),
    // q161: q124's trained assignment, then the k lowest-score members
    // per cluster (fixed-point rank, ties to lowest vec_id)
    "q161_cluster_outliers" ->
      ("WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
        "FROM embeddings WHERE vec_id < 2000), " +
        "c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < 8), " +
        kmAssign("c0", "a1", withScore = false) + ", " +
        kmUpdate("a1", "c0", "x1", "c1") + ", " +
        kmAssign("c1", "a2", withScore = false) + ", " +
        kmUpdate("a2", "c1", "x2", "c2") + ", " +
        kmAssign("c2", "a3", withScore = true) +
        " SELECT cid, CAST(rk AS BIGINT) AS rk, vec_id, score FROM " +
        "(SELECT *, ROW_NUMBER() OVER (PARTITION BY cid ORDER BY " +
        "CAST(floor(score * 1e9 + 0.5) AS BIGINT) ASC, vec_id) AS rk " +
        "FROM a3) WHERE rk <= 3 ORDER BY cid, rk"),
    // q165: q124's trained assignment + the q136 split byte rule on
    // vec_id; per-split cluster-distribution entropy
    "q165_split_embedding_coverage" ->
      ("WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
        "FROM embeddings WHERE vec_id < 2000), " +
        "c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < 8), " +
        kmAssign("c0", "a1", withScore = false) + ", " +
        kmUpdate("a1", "c0", "x1", "c1") + ", " +
        kmAssign("c1", "a2", withScore = false) + ", " +
        kmUpdate("a2", "c1", "x2", "c2") + ", " +
        kmAssign("c2", "a3", withScore = false) + ", " +
        "sp AS (SELECT vec_id, cid, CASE WHEN " +
        "(strpos('0123456789abcdef', substr(md5('split|' || " +
        "CAST(vec_id AS VARCHAR)), 1, 1)) - 1) * 16 + " +
        "strpos('0123456789abcdef', substr(md5('split|' || " +
        "CAST(vec_id AS VARCHAR)), 2, 1)) - 1 < 204 THEN 'train' WHEN " +
        "(strpos('0123456789abcdef', substr(md5('split|' || " +
        "CAST(vec_id AS VARCHAR)), 1, 1)) - 1) * 16 + " +
        "strpos('0123456789abcdef', substr(md5('split|' || " +
        "CAST(vec_id AS VARCHAR)), 2, 1)) - 1 < 230 THEN 'val' " +
        "ELSE 'test' END AS split FROM a3), " +
        "g AS (SELECT split, cid, CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM sp GROUP BY 1, 2), " +
        "w AS (SELECT *, SUM(n) OVER (PARTITION BY split) AS tot FROM g) " +
        "SELECT split, CAST(MAX(tot) AS BIGINT) AS n_vecs, " +
        "CAST(COUNT(*) AS BIGINT) AS n_clusters_hit, " +
        "-SUM((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)) * " +
        "ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))) AS entropy " +
        "FROM w GROUP BY split ORDER BY split"),
    // q124's Lloyd CTEs + q97's unit-normalize and greedy-prune CTEs
    "q125_semdedup_kmeans" ->
      ("WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
        "FROM embeddings WHERE vec_id < 2000), " +
        "c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < 8), " +
        kmAssign("c0", "a1", withScore = false) + ", " +
        kmUpdate("a1", "c0", "x1", "c1") + ", " +
        kmAssign("c1", "a2", withScore = false) + ", " +
        kmUpdate("a2", "c1", "x2", "c2") + ", " +
        kmAssign("c2", "a3", withScore = false) + ", " +
        "un AS (SELECT vec_id, list_transform(v, x -> x / " +
        "sqrt(list_reduce(list_transform(v, y -> y*y), (a,b) -> a+b))) " +
        "AS uv FROM e), " +
        "m AS (SELECT a3.vec_id, a3.cid, un.uv AS v " +
        "FROM a3 JOIN un USING (vec_id)), " +
        "d AS (SELECT DISTINCT a.vec_id FROM m a JOIN m b " +
        "ON a.cid = b.cid AND b.vec_id < a.vec_id " +
        "WHERE list_reduce(list_transform(list_zip(a.v, b.v), " +
        "p -> p[1] * p[2]), (x,y) -> x+y) >= 0.3) " +
        "SELECT m.vec_id, m.cid, " +
        "CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) " +
        "AS kept FROM m LEFT JOIN d ON d.vec_id = m.vec_id " +
        "ORDER BY m.vec_id"),
    // ±1 Rademacher matrix from md5 nibbles (≥8 → +1); quantized
    // integer-valued doubles make the dot exact, one final /1e6
    "q132_random_projection" ->
      ("WITH sv AS (SELECT i, d, CASE WHEN " +
        "strpos('0123456789abcdef', substr(md5('jl|' || " +
        "CAST(i AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 1)) - 9 " +
        ">= 0 THEN 1.0 ELSE -1.0 END AS s " +
        "FROM range(0, 8) t1(i), range(0, 64) t2(d)), " +
        "sl AS (SELECT i, list(s ORDER BY d) AS w FROM sv GROUP BY i), " +
        "q AS (SELECT vec_id, list_transform(embedding, " +
        "x -> floor(CAST(x AS DOUBLE) * 1e6 + 0.5)) AS qv " +
        "FROM embeddings) " +
        "SELECT q.vec_id, CAST(sl.i AS BIGINT) AS i, " +
        "list_reduce(list_transform(list_zip(q.qv, sl.w), " +
        "z -> z[1] * z[2]), (a, b) -> a + b) / 1e6 AS val " +
        "FROM q CROSS JOIN sl ORDER BY q.vec_id, i"),
    // LOO neighbor rank on the 1e-9 fixed-point cosine, ties to the
    // lowest neighbor id; same ordered-fold dot as the engine kernel
    "q142_knn_loo_eval" ->
      ("WITH e AS (SELECT vec_id, label, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0 " +
        "FROM embeddings WHERE vec_id < 2000), " +
        "u AS (SELECT vec_id, label, list_transform(v0, x -> x / " +
        "sqrt(list_reduce(list_prepend(0.0, " +
        "list_transform(v0, y -> y*y)), (a, b) -> a + b))) AS v " +
        "FROM e), " +
        "pr AS (SELECT a.vec_id, a.label, b.label AS nlabel, " +
        "ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY " +
        "CAST(floor(list_reduce(list_prepend(0.0, " +
        "list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])), " +
        "(x, y) -> x + y) * 1e9 + 0.5) AS BIGINT) DESC, b.vec_id ASC) " +
        "AS rk FROM u a JOIN u b ON a.vec_id <> b.vec_id) " +
        "SELECT label, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(CASE WHEN nlabel = label THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS correct, " +
        "CAST(SUM(CASE WHEN nlabel = label THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS acc " +
        "FROM pr WHERE rk = 1 GROUP BY label ORDER BY label"),
    // q154: MMR greedy selection, 5 unrolled steps (q97's unit-vector
    // spelling, q130's fixed-point argmax)
    "q154_mmr_select" ->
      ("WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0 " +
        "FROM embeddings), " +
        "u AS (SELECT vec_id, list_transform(v0, x -> x / " +
        "sqrt(list_reduce(list_transform(v0, y -> y*y), (a,b) -> a+b))) " +
        "AS v FROM e), " +
        "qv AS (SELECT v FROM u WHERE vec_id = 0), " +
        "cand AS (SELECT vec_id, v FROM u WHERE vec_id <> 0), " +
        mmrStep(1) + ", " + mmrStep(2) + ", " + mmrStep(3) + ", " +
        mmrStep(4) + ", " + mmrStep(5) + " " +
        "SELECT rk, vec_id, score FROM (" +
        "SELECT CAST(1 AS BIGINT) AS rk, vec_id, score FROM m1 " +
        "UNION ALL SELECT CAST(2 AS BIGINT), vec_id, score FROM m2 " +
        "UNION ALL SELECT CAST(3 AS BIGINT), vec_id, score FROM m3 " +
        "UNION ALL SELECT CAST(4 AS BIGINT), vec_id, score FROM m4 " +
        "UNION ALL SELECT CAST(5 AS BIGINT), vec_id, score FROM m5) " +
        "ORDER BY rk"),
    // q181: per-dimension embedding health — zipped unnest gives the
    // (dim, value) explode; single-pass E[v²]−E[v]² population variance
    "q181_dim_profile" ->
      ("WITH e AS (SELECT unnest(range(0, CAST(len(embedding) AS BIGINT))) " +
        "AS dim, CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings) " +
        "SELECT CAST(dim AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero, " +
        "SUM(v) / COUNT(*) AS mean, " +
        "SUM(v * v) / COUNT(*) - (SUM(v) / COUNT(*)) * (SUM(v) / COUNT(*)) " +
        "AS var_pop, " +
        "MIN(v) AS vmin, MAX(v) AS vmax " +
        "FROM e GROUP BY dim ORDER BY dim"),
    // q187: recall@5 of the q120 IVF chain against the exact top-5
    // under the same raw-dot metric — both sides and the overlap exact
    "q187_ann_recall" ->
      ("WITH cv AS (SELECT c, d, " +
        "CAST(strpos('0123456789abcdef', substr(md5('iv|' || " +
        "CAST(c AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 1)) - 9 " +
        "AS DOUBLE) / 16.0 AS val " +
        "FROM range(0, 4) t1(c), range(0, 64) t2(d)), " +
        "cent AS (SELECT c, list(val ORDER BY d) AS w FROM cv GROUP BY c), " +
        "v AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
        "FROM embeddings), " +
        "s AS (SELECT vec_id, c, " +
        "list_reduce(list_transform(list_zip(v, w), pr -> pr[1] * pr[2]), " +
        "(acc, y) -> acc + y) AS s FROM v CROSS JOIN cent), " +
        "a AS (SELECT vec_id, c AS cid FROM (SELECT vec_id, c, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, c) AS rn " +
        "FROM s) WHERE rn = 1), " +
        "q AS (SELECT vec_id AS q_id, v AS qv FROM v WHERE vec_id < 5), " +
        "qp AS (SELECT q_id, cid FROM (SELECT q.q_id, s.c AS cid, " +
        "ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY s.s DESC, s.c) AS rn " +
        "FROM q JOIN s ON s.vec_id = q.q_id) WHERE rn <= 2), " +
        "cand AS (SELECT qp.q_id, a.vec_id FROM qp JOIN a ON a.cid = qp.cid " +
        "WHERE a.vec_id <> qp.q_id), " +
        "sc AS (SELECT cand.q_id, cand.vec_id, " +
        "list_reduce(list_transform(list_zip(q.qv, v.v), pr -> pr[1] * pr[2]), " +
        "(acc, y) -> acc + y) AS score " +
        "FROM cand JOIN q ON q.q_id = cand.q_id " +
        "JOIN v ON v.vec_id = cand.vec_id), " +
        "ap AS (SELECT q_id, neighbor FROM (SELECT q_id, " +
        "vec_id AS neighbor, " +
        "ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) " +
        "AS rank FROM sc) WHERE rank <= 5), " +
        "gt0 AS (SELECT q.q_id, v.vec_id AS neighbor, " +
        "list_reduce(list_transform(list_zip(q.qv, v.v), pr -> pr[1] * pr[2]), " +
        "(acc, y) -> acc + y) AS score " +
        "FROM v CROSS JOIN q WHERE v.vec_id <> q.q_id), " +
        "gt AS (SELECT q_id, neighbor FROM (SELECT q_id, neighbor, " +
        "ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, neighbor) " +
        "AS rnk FROM gt0) WHERE rnk <= 5), " +
        "h AS (SELECT gt.q_id, " +
        "CAST(SUM(CASE WHEN ap.neighbor IS NOT NULL THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_hits FROM gt " +
        "LEFT JOIN ap ON ap.q_id = gt.q_id AND ap.neighbor = gt.neighbor " +
        "GROUP BY gt.q_id) " +
        "SELECT q_id, n_hits, " +
        "CAST(n_hits AS DOUBLE) / 5.0 AS recall FROM h ORDER BY q_id"),
    // q207: per vector, top-1 same-label (positive) and top-1
    // different-label (hard negative) neighbors on the q142 1e-9
    // fixed-point cosine; vectors without a same-label peer drop
    "q207_hard_negatives" ->
      ("WITH e AS (SELECT vec_id, label, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0 " +
        "FROM embeddings WHERE vec_id < 2000), " +
        "u AS (SELECT vec_id, label, list_transform(v0, x -> x / " +
        "sqrt(list_reduce(list_prepend(0.0, " +
        "list_transform(v0, y -> y*y)), (a, b) -> a + b))) AS v " +
        "FROM e), " +
        "pr AS (SELECT a.vec_id, a.label, b.vec_id AS nid, " +
        "b.label AS nlabel, " +
        "list_reduce(list_prepend(0.0, " +
        "list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])), " +
        "(x, y) -> x + y) AS cos " +
        "FROM u a JOIN u b ON a.vec_id <> b.vec_id), " +
        "rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, " +
        "(nlabel = label) ORDER BY " +
        "CAST(floor(cos * 1e9 + 0.5) AS BIGINT) DESC, nid ASC) AS rn " +
        "FROM pr), " +
        "pos AS (SELECT vec_id, label, nid AS pos_id, cos AS pos_cos " +
        "FROM rk WHERE rn = 1 AND nlabel = label), " +
        "neg AS (SELECT vec_id, nid AS neg_id, cos AS neg_cos " +
        "FROM rk WHERE rn = 1 AND nlabel <> label) " +
        "SELECT pos.vec_id, pos.label, pos.pos_id, pos.pos_cos, " +
        "neg.neg_id, neg.neg_cos, neg.neg_cos - pos.pos_cos AS margin " +
        "FROM pos JOIN neg USING (vec_id) ORDER BY pos.vec_id"),
    // q227: pairwise cosine between the q104 fixed-point-exact label
    // centroids — dot and norms are left folds over pos-ordered lists
    // (0.0-seeded in Spark; 0.0 + x = x exactly, the q34 argument),
    // one division per row
    "q227_label_centroid_matrix" ->
      ("WITH p AS (SELECT unnest(range(1, 65)) AS pos), " +
        "e AS (SELECT label, pos, " +
        "CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1000000000000.0 + 0.5) AS BIGINT) AS x " +
        "FROM embeddings, p), " +
        "g AS (SELECT label, pos, COUNT(*) AS n, " +
        "CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) / 1000000000000.0 / COUNT(*) AS m " +
        "FROM e GROUP BY label, pos), " +
        "a AS (SELECT label, MAX(n) AS n_vecs, " +
        "list(m ORDER BY pos) AS cent FROM g GROUP BY label), " +
        "w AS (SELECT label, n_vecs, cent, " +
        "sqrt(list_reduce(list_transform(cent, x -> x * x), " +
        "(acc, y) -> acc + y)) AS norm FROM a) " +
        "SELECT CAST(x.label AS BIGINT) AS label_a, " +
        "CAST(y.label AS BIGINT) AS label_b, " +
        "CAST(x.n_vecs AS BIGINT) AS n_a, CAST(y.n_vecs AS BIGINT) AS n_b, " +
        "list_reduce(list_transform(list_zip(x.cent, y.cent), " +
        "pr -> pr[1] * pr[2]), (s, v) -> s + v) AS dot, " +
        "x.norm AS norm_a, y.norm AS norm_b, " +
        "list_reduce(list_transform(list_zip(x.cent, y.cent), " +
        "pr -> pr[1] * pr[2]), (s, v) -> s + v) / (x.norm * y.norm) " +
        "AS cosine " +
        "FROM w x JOIN w y ON x.label < y.label " +
        "ORDER BY label_a, label_b"),
    // q252: the q120 md5-nibble coarse quantizer at 16 lists — per
    // inverted list, count and exact relative deviation from uniform
    // (the q231 shard-balance discipline applied to the ANN index);
    // empty lists emitted
    "q252_ivf_list_balance" ->
      ("WITH cv AS (SELECT c, d, " +
        "CAST(strpos('0123456789abcdef', substr(md5('iv|' || " +
        "CAST(c AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 1)) - 9 " +
        "AS DOUBLE) / 16.0 AS val " +
        "FROM range(0, 16) t1(c), range(0, 64) t2(d)), " +
        "cent AS (SELECT c, list(val ORDER BY d) AS w FROM cv GROUP BY c), " +
        "v AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
        "FROM embeddings), " +
        "s AS (SELECT vec_id, c, " +
        "list_reduce(list_transform(list_zip(v, w), pr -> pr[1] * pr[2]), " +
        "(acc, y) -> acc + y) AS s FROM v CROSS JOIN cent), " +
        "a AS (SELECT vec_id, c AS cid FROM (SELECT vec_id, c, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, c) AS rn " +
        "FROM s) WHERE rn = 1), " +
        "cnt AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n FROM a " +
        "GROUP BY cid), " +
        "alls AS (SELECT CAST(c AS BIGINT) AS cid FROM range(0, 16) t(c)), " +
        "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cnt) " +
        "SELECT alls.cid, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_vectors, " +
        "CAST(COALESCE(cnt.n, 0) AS DOUBLE) / CAST(tot.t AS DOUBLE) " +
        "AS frac, " +
        "CAST(COALESCE(cnt.n, 0) * 16 AS DOUBLE) / CAST(tot.t AS DOUBLE) " +
        "- 1.0 AS dev " +
        "FROM alls LEFT JOIN cnt ON cnt.cid = alls.cid CROSS JOIN tot " +
        "ORDER BY alls.cid"),
    // q253: recall@10 of the 8-list md5-nibble IVF vs brute force,
    // swept over nprobe in {1, 2, 4} — the probe-budget decision table
    "q253_multiprobe_recall_sweep" -> q253Sql,
    // q391: per-list census after the delete request — the maintained
    // lists hold the retained assignments of the q120 model; the
    // deleted column is the request's per-list mass
    "q391_ivf_delete_maintenance" ->
      (ivfModelCtes +
        " SELECT cid, " +
        "CAST(SUM(CASE WHEN vec_id % 37 <> 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_vectors, " +
        "CAST(SUM(CASE WHEN vec_id % 37 = 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_deleted " +
        "FROM a GROUP BY cid ORDER BY cid"),
    // q392: top-10 nprobe=2 search through the compacted lists for
    // five retained queries — candidates are retained list members
    // only, so a surviving deleted vector breaks the hash
    "q392_ivf_delete_then_query" ->
      (ivfModelCtes + ", " +
        "q AS (SELECT vec_id AS q_id, v AS qv FROM v " +
        "WHERE vec_id BETWEEN 1 AND 5), " +
        "qp AS (SELECT q_id, cid FROM (SELECT q.q_id, s.c AS cid, " +
        "ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY s.s DESC, s.c) " +
        "AS rn FROM q JOIN s ON s.vec_id = q.q_id) WHERE rn <= 2), " +
        "cand AS (SELECT qp.q_id, a.vec_id FROM qp " +
        "JOIN a ON a.cid = qp.cid " +
        "WHERE a.vec_id <> qp.q_id AND a.vec_id % 37 <> 0), " +
        "sc AS (SELECT cand.q_id, cand.vec_id, " +
        "list_reduce(list_transform(list_zip(q.qv, v.v), " +
        "pr -> pr[1] * pr[2]), (acc, y) -> acc + y) AS score " +
        "FROM cand JOIN q ON q.q_id = cand.q_id " +
        "JOIN v ON v.vec_id = cand.vec_id), " +
        "rk AS (SELECT q_id, vec_id AS neighbor, score, " +
        "ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, " +
        "vec_id) AS rank FROM sc) " +
        "SELECT q_id, CAST(rank AS BIGINT) AS rank, neighbor, score " +
        "FROM rk WHERE rank <= 10 ORDER BY q_id, rank"),
    // q433: the rebalance flow matrix — survivors of the delete
    // re-assigned from the 4-list `iv` model to the refreshed 8-list
    // `rb` model; both assignments are the broadcast-argmax md5-nibble
    // arithmetic. CTE prefix `rb` is unique to the rebalance pair.
    "q433_ann_rebalance_census" ->
      (ivfModelCtes + ", " + rbModelCtes +
        " SELECT a.cid AS cid_old, rba.cid_new, " +
        "CAST(COUNT(*) AS BIGINT) AS n_vectors " +
        "FROM a JOIN rba ON rba.vec_id = a.vec_id " +
        "WHERE a.vec_id % 37 <> 0 " +
        "GROUP BY a.cid, rba.cid_new ORDER BY cid_old, cid_new"),
    // q434: search parity at equal probed fraction — per retained
    // query, top-10 overlap with the retained-corpus brute ranking
    // through the OLD compacted index (nprobe=2 of 4) and the
    // REBALANCED index (nprobe=4 of 8)
    "q434_ann_rebalance_parity" ->
      (ivfModelCtes + ", " + rbModelCtes + ", " +
        "rbret AS (SELECT vec_id, v FROM v WHERE vec_id % 37 <> 0), " +
        "rbq AS (SELECT vec_id AS q_id, v AS qv FROM v " +
        "WHERE vec_id BETWEEN 1 AND 5), " +
        "rbbr AS (SELECT q_id, vec_id FROM (SELECT rbq.q_id, r.vec_id, " +
        "ROW_NUMBER() OVER (PARTITION BY rbq.q_id ORDER BY " +
        "list_reduce(list_transform(list_zip(rbq.qv, r.v), " +
        "pr -> pr[1] * pr[2]), (acc, y) -> acc + y) DESC, r.vec_id) " +
        "AS rank FROM rbq JOIN rbret r ON r.vec_id <> rbq.q_id) " +
        "WHERE rank <= 10), " +
        "rbqpo AS (SELECT q_id, cid FROM (SELECT rbq.q_id, s.c AS cid, " +
        "ROW_NUMBER() OVER (PARTITION BY rbq.q_id ORDER BY s.s DESC, " +
        "s.c) AS rn FROM rbq JOIN s ON s.vec_id = rbq.q_id) " +
        "WHERE rn <= 2), " +
        "rbcdo AS (SELECT rbqpo.q_id, a.vec_id FROM rbqpo " +
        "JOIN a ON a.cid = rbqpo.cid " +
        "WHERE a.vec_id <> rbqpo.q_id AND a.vec_id % 37 <> 0), " +
        "rbselo AS (SELECT q_id, vec_id FROM (SELECT rbcdo.q_id, " +
        "rbcdo.vec_id, ROW_NUMBER() OVER (PARTITION BY rbcdo.q_id " +
        "ORDER BY list_reduce(list_transform(list_zip(rbq.qv, v.v), " +
        "pr -> pr[1] * pr[2]), (acc, y) -> acc + y) DESC, rbcdo.vec_id) " +
        "AS rank FROM rbcdo JOIN rbq ON rbq.q_id = rbcdo.q_id " +
        "JOIN v ON v.vec_id = rbcdo.vec_id) WHERE rank <= 10), " +
        "rbqs AS (SELECT rbq.q_id, rbcent.c, " +
        "list_reduce(list_transform(list_zip(rbq.qv, rbcent.w), " +
        "pr -> pr[1] * pr[2]), (acc, y) -> acc + y) AS s " +
        "FROM rbq CROSS JOIN rbcent), " +
        "rbqpn AS (SELECT q_id, c AS cid FROM (SELECT q_id, c, " +
        "ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY s DESC, c) " +
        "AS rn FROM rbqs) WHERE rn <= 4), " +
        "rbcdn AS (SELECT rbqpn.q_id, rba.vec_id FROM rbqpn " +
        "JOIN rba ON rba.cid_new = rbqpn.cid " +
        "WHERE rba.vec_id <> rbqpn.q_id), " +
        "rbseln AS (SELECT q_id, vec_id FROM (SELECT rbcdn.q_id, " +
        "rbcdn.vec_id, ROW_NUMBER() OVER (PARTITION BY rbcdn.q_id " +
        "ORDER BY list_reduce(list_transform(list_zip(rbq.qv, v.v), " +
        "pr -> pr[1] * pr[2]), (acc, y) -> acc + y) DESC, rbcdn.vec_id) " +
        "AS rank FROM rbcdn JOIN rbq ON rbq.q_id = rbcdn.q_id " +
        "JOIN v ON v.vec_id = rbcdn.vec_id) WHERE rank <= 10) " +
        "SELECT rbbr.q_id, " +
        "CAST(SUM(CASE WHEN rbselo.vec_id IS NOT NULL THEN 1 ELSE 0 " +
        "END) AS BIGINT) AS n_overlap_old, " +
        "CAST(SUM(CASE WHEN rbseln.vec_id IS NOT NULL THEN 1 ELSE 0 " +
        "END) AS BIGINT) AS n_overlap_new, " +
        "CAST(SUM(CASE WHEN rbselo.vec_id IS NOT NULL THEN 1 ELSE 0 " +
        "END) AS DOUBLE) / 10.0 AS agreement_old, " +
        "CAST(SUM(CASE WHEN rbseln.vec_id IS NOT NULL THEN 1 ELSE 0 " +
        "END) AS DOUBLE) / 10.0 AS agreement_new " +
        "FROM rbbr " +
        "LEFT JOIN rbselo ON rbselo.q_id = rbbr.q_id " +
        "AND rbselo.vec_id = rbbr.vec_id " +
        "LEFT JOIN rbseln ON rbseln.q_id = rbbr.q_id " +
        "AND rbseln.vec_id = rbbr.vec_id " +
        "GROUP BY rbbr.q_id ORDER BY rbbr.q_id"),
    // q265: per-label cosine between the centroids of the two
    // deterministic md5('cd|') halves — the q104 fixed-point centroid
    // CTEs keyed by (label, half), one A–B join row per label
    "q265_centroid_drift" ->
      ("WITH p AS (SELECT unnest(range(1, 65)) AS pos), " +
        "hv AS (SELECT vec_id, label, embedding, " +
        "CASE WHEN strpos('0123456789abcdef', " +
        "substr(md5('cd|' || CAST(vec_id AS VARCHAR)), 1, 1)) - 1 < 8 " +
        "THEN 0 ELSE 1 END AS half FROM embeddings), " +
        "e AS (SELECT label, half, pos, " +
        "CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1000000000000.0 + 0.5) AS BIGINT) AS x " +
        "FROM hv, p), " +
        "g AS (SELECT label, half, pos, COUNT(*) AS n, " +
        "CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) / 1000000000000.0 / COUNT(*) AS m " +
        "FROM e GROUP BY 1, 2, 3), " +
        "a AS (SELECT label, half, MAX(n) AS n_vecs, " +
        "list(m ORDER BY pos) AS cent FROM g GROUP BY 1, 2), " +
        "w AS (SELECT label, half, n_vecs, cent, " +
        "sqrt(list_reduce(list_transform(cent, x -> x * x), " +
        "(acc, y) -> acc + y)) AS norm FROM a) " +
        "SELECT CAST(x.label AS BIGINT) AS label, " +
        "CAST(x.n_vecs AS BIGINT) AS n_a, " +
        "CAST(y.n_vecs AS BIGINT) AS n_b, " +
        "list_reduce(list_transform(list_zip(x.cent, y.cent), " +
        "pr -> pr[1] * pr[2]), (s, v) -> s + v) AS dot, " +
        "x.norm AS norm_a, y.norm AS norm_b, " +
        "list_reduce(list_transform(list_zip(x.cent, y.cent), " +
        "pr -> pr[1] * pr[2]), (s, v) -> s + v) / (x.norm * y.norm) " +
        "AS cosine " +
        "FROM w x JOIN w y ON x.label = y.label " +
        "AND x.half = 0 AND y.half = 1 ORDER BY label"),
    // q286/q288/q289: the internal-validity suite over the shared
    // vec x centroid fixed-point cosine relation (simCtes): exact
    // q104 centroids, q142 unit spelling, 1e-9 rounding before any
    // comparison
    "q286_simplified_silhouette" -> (simCtes +
      ", pv AS (SELECT vec_id, label, " +
      "MAX(CASE WHEN clabel = label THEN sim_fp END) AS own_fp, " +
      "MAX(CASE WHEN clabel <> label THEN sim_fp END) AS other_fp " +
      "FROM sm GROUP BY 1, 2), " +
      "sv AS (SELECT label, other_fp, " +
      "1.0 - CAST(own_fp AS DOUBLE) / 1000000000.0 AS aa, " +
      "1.0 - CAST(other_fp AS DOUBLE) / 1000000000.0 AS bb FROM pv), " +
      "sx AS (SELECT label, CASE WHEN other_fp IS NULL THEN 0.0 " +
      "WHEN greatest(aa, bb) <= 0.0 THEN 0.0 " +
      "ELSE (bb - aa) / greatest(aa, bb) END AS s FROM sv) " +
      "SELECT CAST(label AS BIGINT) AS label, " +
      "CAST(COUNT(*) AS BIGINT) AS n_vecs, " +
      "CAST(SUM(CAST(floor(s * 1000000000.0 + 0.5) AS BIGINT)) " +
      "AS DOUBLE) / 1000000000.0 / COUNT(*) AS mean_silhouette, " +
      "CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS n_negative FROM sx GROUP BY label ORDER BY label"),
    "q288_centroid_margin_deciles" -> (simCtes +
      ", rk AS (SELECT vec_id, label, sim_fp, " +
      "ROW_NUMBER() OVER (PARTITION BY vec_id " +
      "ORDER BY sim_fp DESC, clabel ASC) AS rk FROM sm), " +
      "mg AS (SELECT vec_id, label, " +
      "MAX(CASE WHEN rk = 1 THEN sim_fp END) - " +
      "MAX(CASE WHEN rk = 2 THEN sim_fp END) AS margin_fp " +
      "FROM rk WHERE rk <= 2 GROUP BY 1, 2), " +
      "h AS (SELECT label, margin_fp, CAST(COUNT(*) AS BIGINT) AS cnt " +
      "FROM mg GROUP BY 1, 2), " +
      "cm AS (SELECT label, margin_fp, cnt, " +
      "SUM(cnt) OVER (PARTITION BY label ORDER BY margin_fp) AS cum, " +
      "SUM(cnt) OVER (PARTITION BY label) AS n FROM h), " +
      "dd AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS decile) " +
      "SELECT CAST(label AS BIGINT) AS label, " +
      "CAST(dd.decile AS BIGINT) AS decile, " +
      "CAST(margin_fp AS BIGINT) AS margin_fp, " +
      "CAST(n AS BIGINT) AS n_vecs FROM cm CROSS JOIN dd " +
      "WHERE CAST(CEIL(CAST(dd.decile AS DOUBLE) * CAST(n AS DOUBLE) " +
      "/ 10.0) AS BIGINT) > cum - cnt " +
      "AND CAST(CEIL(CAST(dd.decile AS DOUBLE) * CAST(n AS DOUBLE) " +
      "/ 10.0) AS BIGINT) <= cum ORDER BY label, decile"),
    "q289_davies_bouldin" -> (simCtes +
      ", sc AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs, " +
      "CAST(COUNT(*) * 1000000000 - CAST(SUM(sim_fp) AS BIGINT) " +
      "AS DOUBLE) / 1000000000.0 / COUNT(*) " +
      "AS s_mean FROM sm WHERE clabel = label GROUP BY 1), " +
      "pr AS (SELECT x.clabel AS la, y.clabel AS lb, " +
      "1.0 - list_reduce(list_prepend(0.0, " +
      "list_transform(list_zip(x.cent, y.cent), z -> z[1] * z[2])), " +
      "(aa, bb) -> aa + bb) / (x.cnorm * y.cnorm) AS d " +
      "FROM an x CROSS JOIN an y WHERE x.clabel <> y.clabel), " +
      "rt AS (SELECT pr.la, pr.lb, sa.n_vecs, sa.s_mean, " +
      "(sa.s_mean + sb.s_mean) / pr.d AS ratio " +
      "FROM pr JOIN sc sa ON sa.label = pr.la " +
      "JOIN sc sb ON sb.label = pr.lb), " +
      "w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY la " +
      "ORDER BY ratio DESC, lb ASC) AS rk FROM rt) " +
      "SELECT CAST(la AS BIGINT) AS label, n_vecs, s_mean, " +
      "CAST(lb AS BIGINT) AS worst_label, ratio AS db " +
      "FROM w WHERE rk = 1 ORDER BY label"),
  )

  /** Shared CTE chain for the internal-validity suite: exact q104
    * centroids (fixed-point long sums), the q142 unit-vector
    * spelling, centroid norms by the q227 left fold, and the 1e-9
    * fixed-point vec x centroid cosine relation `sm`.
    */
  private def simCtes: String =
    ("WITH p AS (SELECT unnest(range(1, 65)) AS pos), " +
      "e AS (SELECT label, pos, " +
      "CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1000000000000.0 + 0.5) AS BIGINT) AS x " +
      "FROM embeddings, p), " +
      "g AS (SELECT label, pos, " +
      "CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) / 1000000000000.0 / COUNT(*) AS m " +
      "FROM e GROUP BY label, pos), " +
      "a AS (SELECT label AS clabel, list(m ORDER BY pos) AS cent " +
      "FROM g GROUP BY label), " +
      "an AS (SELECT clabel, cent, " +
      "sqrt(list_reduce(list_prepend(0.0, " +
      "list_transform(cent, x -> x * x)), (aa, bb) -> aa + bb)) " +
      "AS cnorm FROM a), " +
      "u0 AS (SELECT vec_id, label, " +
      "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0 " +
      "FROM embeddings), " +
      "u AS (SELECT vec_id, label, list_transform(v0, x -> x / " +
      "sqrt(list_reduce(list_prepend(0.0, " +
      "list_transform(v0, y -> y * y)), (aa, bb) -> aa + bb))) AS v " +
      "FROM u0), " +
      "sm AS (SELECT u.vec_id, u.label, an.clabel, " +
      "CAST(floor(list_reduce(list_prepend(0.0, " +
      "list_transform(list_zip(u.v, an.cent), z -> z[1] * z[2])), " +
      "(x, y) -> x + y) / an.cnorm * 1000000000.0 + 0.5) AS BIGINT) " +
      "AS sim_fp FROM u CROSS JOIN an)")

  private def q104Sql: String =
    ("WITH p AS (SELECT unnest(range(1, 65)) AS pos), " +
      "e AS (SELECT label, pos, " +
      "CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1000000000000.0 + 0.5) AS BIGINT) AS x " +
      "FROM embeddings, p), " +
      "g AS (SELECT label, pos, COUNT(*) AS n, " +
      "CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) / 1000000000000.0 / COUNT(*) AS m " +
      "FROM e GROUP BY label, pos), " +
      "a AS (SELECT label, MAX(n) AS n_vecs, " +
      "list(m ORDER BY pos) AS cent FROM g GROUP BY label) " +
      "SELECT CAST(label AS BIGINT) AS label, n_vecs, " +
      "cent[1] AS c0, cent[2] AS c1, cent[3] AS c2, cent[4] AS c3, " +
      "sqrt(list_reduce(list_transform(cent, x -> x * x), " +
      "(acc, y) -> acc + y)) AS norm " +
      "FROM a ORDER BY label")

  /** The q120 4-list md5-nibble model + assignment, reused by the
    * delete-maintenance rows (q391/q392): cv/cent (the fixed
    * quantizer), v (double-cast corpus), s (all centroid scores),
    * a (argmax list assignment).
    */
  /** The refreshed 8-list `rb`-seed quantizer and the retained
    * survivors' re-assignment (q433/q434): rbcv/rbcent (model),
    * rbs (scores over retained vectors), rba (argmax → cid_new).
    * Composes after [[ivfModelCtes]] (reads its `v`).
    */
  private[oracles] def rbModelCtes: String =
    "rbcv AS (SELECT c, d, " +
      "CAST(strpos('0123456789abcdef', substr(md5('rb|' || " +
      "CAST(c AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 1)) - 9 " +
      "AS DOUBLE) / 16.0 AS val " +
      "FROM range(0, 8) t1(c), range(0, 64) t2(d)), " +
      "rbcent AS (SELECT c, list(val ORDER BY d) AS w FROM rbcv " +
      "GROUP BY c), " +
      "rbs AS (SELECT vec_id, c, " +
      "list_reduce(list_transform(list_zip(v, w), pr -> pr[1] * pr[2]), " +
      "(acc, y) -> acc + y) AS s FROM v CROSS JOIN rbcent " +
      "WHERE vec_id % 37 <> 0), " +
      "rba AS (SELECT vec_id, c AS cid_new FROM (SELECT vec_id, c, " +
      "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, c) " +
      "AS rn FROM rbs) WHERE rn = 1)"

  private[oracles] def ivfModelCtes: String =
    "WITH cv AS (SELECT c, d, " +
      "CAST(strpos('0123456789abcdef', substr(md5('iv|' || " +
      "CAST(c AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 1)) - 9 " +
      "AS DOUBLE) / 16.0 AS val " +
      "FROM range(0, 4) t1(c), range(0, 64) t2(d)), " +
      "cent AS (SELECT c, list(val ORDER BY d) AS w FROM cv GROUP BY c), " +
      "v AS (SELECT vec_id, " +
      "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
      "FROM embeddings), " +
      "s AS (SELECT vec_id, c, " +
      "list_reduce(list_transform(list_zip(v, w), pr -> pr[1] * pr[2]), " +
      "(acc, y) -> acc + y) AS s FROM v CROSS JOIN cent), " +
      "a AS (SELECT vec_id, c AS cid FROM (SELECT vec_id, c, " +
      "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, c) AS rn " +
      "FROM s) WHERE rn = 1)"

  private def q253Sql: String = {
    val probes = Seq(1, 2, 4)
    val perP = probes.map { p =>
      s"cand$p AS (SELECT qp.q_id, a.vec_id FROM qp " +
        s"JOIN a ON a.cid = qp.cid WHERE qp.rn <= $p " +
        "AND a.vec_id <> qp.q_id), " +
        s"sc$p AS (SELECT cand$p.q_id, cand$p.vec_id, " +
        "list_reduce(list_transform(list_zip(q.qv, v.v), " +
        "pr -> pr[1] * pr[2]), (acc, y) -> acc + y) AS score " +
        s"FROM cand$p JOIN q ON q.q_id = cand$p.q_id " +
        s"JOIN v ON v.vec_id = cand$p.vec_id), " +
        s"sel$p AS (SELECT q_id, vec_id AS neighbor FROM " +
        "(SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id " +
        s"ORDER BY score DESC, vec_id) AS rank FROM sc$p) " +
        "WHERE rank <= 10), " +
        s"hit$p AS (SELECT CAST(COUNT(*) AS BIGINT) AS h FROM sel$p " +
        s"JOIN gt ON gt.q_id = sel$p.q_id " +
        s"AND gt.neighbor = sel$p.neighbor)"
    }.mkString(", ")
    val unions = probes.map { p =>
      s"SELECT CAST($p AS BIGINT) AS nprobe, hit$p.h AS n_hits, " +
        "nt.t AS n_truth, CAST(hit" + p + ".h AS DOUBLE) / " +
        s"CAST(nt.t AS DOUBLE) AS recall FROM hit$p CROSS JOIN nt"
    }.mkString(" UNION ALL ")
    "WITH cv AS (SELECT c, d, " +
      "CAST(strpos('0123456789abcdef', substr(md5('iv|' || " +
      "CAST(c AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 1)) - 9 " +
      "AS DOUBLE) / 16.0 AS val " +
      "FROM range(0, 8) t1(c), range(0, 64) t2(d)), " +
      "cent AS (SELECT c, list(val ORDER BY d) AS w FROM cv GROUP BY c), " +
      "v AS (SELECT vec_id, " +
      "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
      "FROM embeddings), " +
      "s AS (SELECT vec_id, c, " +
      "list_reduce(list_transform(list_zip(v, w), pr -> pr[1] * pr[2]), " +
      "(acc, y) -> acc + y) AS s FROM v CROSS JOIN cent), " +
      "a AS (SELECT vec_id, c AS cid FROM (SELECT vec_id, c, " +
      "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, c) AS rn " +
      "FROM s) WHERE rn = 1), " +
      "q AS (SELECT vec_id AS q_id, v AS qv FROM v WHERE vec_id < 20), " +
      "gts AS (SELECT q.q_id, v.vec_id, " +
      "list_reduce(list_transform(list_zip(q.qv, v.v), " +
      "pr -> pr[1] * pr[2]), (acc, y) -> acc + y) AS score " +
      "FROM q JOIN v ON v.vec_id <> q.q_id), " +
      "gt AS (SELECT q_id, vec_id AS neighbor FROM " +
      "(SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id " +
      "ORDER BY score DESC, vec_id) AS rank FROM gts) WHERE rank <= 10), " +
      "nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM gt), " +
      "qp AS (SELECT q_id, cid, rn FROM (SELECT q.q_id, s.c AS cid, " +
      "ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY s.s DESC, s.c) " +
      "AS rn FROM q JOIN s ON s.vec_id = q.q_id) WHERE rn <= 4), " +
      perP + " " + unions + " ORDER BY nprobe"
  }
}
