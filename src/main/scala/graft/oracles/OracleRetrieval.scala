package graft.oracles

/** DuckDB oracles for the retrieval-evaluation suite (q399–q403).
  *
  * Ground truth is the label relation (exact data, not an FP
  * threshold); scores are the q120/q253 raw-dot arithmetic; the NDCG
  * folds run left-to-right over SORTED ≤10-element lists in both
  * engines (Spark's `aggregate(.., 0.0, +)` vs `list_reduce` over the
  * gains list — 0.0 + g1 ≡ g1 exactly, so the fold orders agree).
  *
  * CTE prefix `rev` is unique to this family.
  */
object OracleRetrieval {

  /** Scored + ranked brute-force base: revv (corpus with labels),
    * revq (the 20 query vectors), revr (per-query ranking by
    * (score DESC, vec_id)).
    */
  private val revBase =
    "revv AS (SELECT vec_id, " +
      "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v, " +
      "CAST(label AS BIGINT) AS label FROM embeddings), " +
      "revq AS (SELECT vec_id AS q_id, v AS qv, label AS q_label " +
      "FROM revv WHERE vec_id BETWEEN 1 AND 20), " +
      "revs AS (SELECT q.q_id, q.q_label, c.vec_id, c.label, " +
      "list_reduce(list_transform(list_zip(q.qv, c.v), " +
      "pr -> pr[1] * pr[2]), (a, b) -> a + b) AS score " +
      "FROM revq q JOIN revv c ON c.vec_id <> q.q_id), " +
      "revr AS (SELECT q_id, q_label, vec_id, label, score, " +
      "CAST(ROW_NUMBER() OVER (PARTITION BY q_id " +
      "ORDER BY score DESC, vec_id) AS BIGINT) AS rank FROM revs)"

  private val revLabelCte =
    "revl AS (SELECT label AS q_label, " +
      "CAST(COUNT(*) AS BIGINT) AS n_label FROM revv GROUP BY label)"

  /** The q402 nprobe=2 IVF side (revqp probes, revcand candidates,
    * revivf scores, revit ranked top-10) — shared with the sign-test
    * family. Composes after [[OracleAnn.ivfModelCtes]] + [[revBase]].
    */
  private val revIvfCtes =
    "revqp AS (SELECT q_id, cid FROM (SELECT q.q_id, s.c AS cid, " +
      "ROW_NUMBER() OVER (PARTITION BY q.q_id " +
      "ORDER BY s.s DESC, s.c) AS rn " +
      "FROM revq q JOIN s ON s.vec_id = q.q_id) WHERE rn <= 2), " +
      "revcand AS (SELECT p.q_id, a.vec_id FROM revqp p " +
      "JOIN a ON a.cid = p.cid WHERE a.vec_id <> p.q_id), " +
      "revivf AS (SELECT cd.q_id, q.q_label, cd.vec_id, cc.label, " +
      "list_reduce(list_transform(list_zip(q.qv, cc.v), " +
      "pr -> pr[1] * pr[2]), (a, b) -> a + b) AS score " +
      "FROM revcand cd JOIN revq q ON q.q_id = cd.q_id " +
      "JOIN revv cc ON cc.vec_id = cd.vec_id), " +
      "revit AS (SELECT * FROM (SELECT q_id, q_label, vec_id, label, " +
      "CAST(ROW_NUMBER() OVER (PARTITION BY q_id " +
      "ORDER BY score DESC, vec_id) AS BIGINT) AS rank " +
      "FROM revivf) WHERE rank <= 10)"

  /** Paired per-query hit/rank outcome CTEs for the sign tests:
    * revhb/revhi (label hits in the top 10, brute/IVF), revho (hit
    * outcomes), revrb/revri (first relevant rank in the top 10),
    * revro (rank outcomes, absence = 11, smaller wins).
    */
  private val revOutcomeCtes =
    "revhb AS (SELECT q_id, CAST(SUM(CASE WHEN label = q_label " +
      "THEN 1 ELSE 0 END) AS BIGINT) AS hits_brute FROM revr " +
      "WHERE rank <= 10 GROUP BY q_id), " +
      "revhi AS (SELECT q_id, CAST(SUM(CASE WHEN label = q_label " +
      "THEN 1 ELSE 0 END) AS BIGINT) AS hits_ivf FROM revit " +
      "GROUP BY q_id), " +
      "revho AS (SELECT 'hits_at_10' AS metric, " +
      "CASE WHEN COALESCE(i.hits_ivf, 0) > b.hits_brute THEN 'win' " +
      "WHEN COALESCE(i.hits_ivf, 0) < b.hits_brute THEN 'loss' " +
      "ELSE 'tie' END AS o " +
      "FROM revhb b LEFT JOIN revhi i USING (q_id)), " +
      "revrb AS (SELECT q_id, MIN(rank) AS r FROM revr " +
      "WHERE rank <= 10 AND label = q_label GROUP BY q_id), " +
      "revri AS (SELECT q_id, MIN(rank) AS r FROM revit " +
      "WHERE label = q_label GROUP BY q_id), " +
      "revro AS (SELECT 'first_rel_rank' AS metric, " +
      "CASE WHEN COALESCE(ri.r, 11) < COALESCE(rb.r, 11) THEN 'win' " +
      "WHEN COALESCE(ri.r, 11) > COALESCE(rb.r, 11) THEN 'loss' " +
      "ELSE 'tie' END AS o " +
      "FROM revq q LEFT JOIN revrb rb USING (q_id) " +
      "LEFT JOIN revri ri USING (q_id))"

  val sql: Map[String, String] = Map(
    // q399: P/R@10 on label relevance — integer numerators, two
    // divisions per row
    "q399_retrieval_precision_recall" ->
      (s"WITH $revBase, $revLabelCte " +
        "SELECT r.q_id, r.q_label, l.n_label - 1 AS n_rel, " +
        "CAST(SUM(CASE WHEN r.label = r.q_label THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_hits, " +
        "CAST(SUM(CASE WHEN r.label = r.q_label THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / 10.0 AS p_at_10, " +
        "CASE WHEN l.n_label > 1 THEN " +
        "CAST(SUM(CASE WHEN r.label = r.q_label THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / CAST(l.n_label - 1 AS DOUBLE) " +
        "ELSE 0.0 END AS r_at_10 " +
        "FROM revr r JOIN revl l USING (q_label) WHERE r.rank <= 10 " +
        "GROUP BY r.q_id, r.q_label, l.n_label ORDER BY r.q_id"),
    // q400: first relevant rank + its reciprocal, per query — the
    // trajectory table, no FP mean across queries
    "q400_retrieval_mrr" ->
      (s"WITH $revBase " +
        "SELECT q_id, CAST(MIN(rank) AS BIGINT) AS first_rel_rank, " +
        "1.0 / CAST(MIN(rank) AS DOUBLE) AS reciprocal_rank " +
        "FROM revr WHERE label = q_label GROUP BY q_id ORDER BY q_id"),
    // q401: binary-gain NDCG@10 — DCG folds the sorted relevant ranks,
    // IDCG folds ranks 1..min(10, n_rel); both left folds
    "q401_retrieval_ndcg" ->
      (s"WITH $revBase, $revLabelCte, " +
        "revh AS (SELECT q_id, q_label, " +
        "list_sort(list(rank) FILTER (WHERE label = q_label)) AS hits, " +
        "CAST(COUNT(*) FILTER (WHERE label = q_label) AS BIGINT) " +
        "AS n_hits FROM revr WHERE rank <= 10 " +
        "GROUP BY q_id, q_label), " +
        "revd AS (SELECT q_id, q_label, n_hits, " +
        "CASE WHEN len(hits) = 0 THEN 0.0 ELSE " +
        "list_reduce(list_prepend(0.0, list_transform(hits, " +
        "r -> 1.0 / log2(CAST(r AS DOUBLE) + 1.0))), " +
        "(a, b) -> a + b) END AS dcg FROM revh), " +
        "revi AS (SELECT q_label, " +
        "list_reduce(list_prepend(0.0, list_transform(" +
        "range(1, GREATEST(CAST(1 AS BIGINT), " +
        "LEAST(CAST(10 AS BIGINT), n_label - 1)) + 1), " +
        "r -> 1.0 / log2(CAST(r AS DOUBLE) + 1.0))), " +
        "(a, b) -> a + b) AS idcg FROM revl) " +
        "SELECT d.q_id, d.q_label, d.n_hits, d.dcg, i.idcg, " +
        "CASE WHEN i.idcg > 0.0 THEN d.dcg / i.idcg ELSE 0.0 END " +
        "AS ndcg " +
        "FROM revd d JOIN revi i USING (q_label) ORDER BY d.q_id"),
    // q402: the q120 quantizer at nprobe=2 vs the brute top-10 —
    // label hits through the index + set agreement
    "q402_ivf_vs_brute" ->
      (OracleAnn.ivfModelCtes + ", " + revBase + ", " + revIvfCtes +
        ", revb AS (SELECT q_id, vec_id FROM revr WHERE rank <= 10) " +
        "SELECT t.q_id, t.q_label, " +
        "CAST(COUNT(*) AS BIGINT) AS n_returned, " +
        "CAST(SUM(CASE WHEN t.label = t.q_label THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_label_hits, " +
        "CAST(SUM(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_brute_overlap, " +
        "CAST(SUM(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / 10.0 AS agreement_at_10 " +
        "FROM revit t LEFT JOIN revb b " +
        "ON b.q_id = t.q_id AND b.vec_id = t.vec_id " +
        "GROUP BY t.q_id, t.q_label ORDER BY t.q_id"),
    // q403: kNN majority-label prediction (ties to the smaller label)
    // → confusion counts
    "q403_knn_confusion" ->
      (s"WITH $revBase, " +
        "revvt AS (SELECT q_id, q_label, label, " +
        "CAST(COUNT(*) AS BIGINT) AS n_votes FROM revr " +
        "WHERE rank <= 10 GROUP BY q_id, q_label, label), " +
        "revp AS (SELECT q_id, q_label, label AS pred_label FROM " +
        "(SELECT q_id, q_label, label, ROW_NUMBER() OVER " +
        "(PARTITION BY q_id ORDER BY n_votes DESC, label) AS rn " +
        "FROM revvt) WHERE rn = 1) " +
        "SELECT q_label, pred_label, " +
        "CAST(COUNT(*) AS BIGINT) AS n_queries FROM revp " +
        "GROUP BY q_label, pred_label ORDER BY q_label, pred_label"),
    // q435: paired per-query hits, brute vs IVF, with the sign-test
    // outcome under "bigger wins"
    "q435_retrieval_signtest_table" ->
      (OracleAnn.ivfModelCtes + ", " + revBase + ", " + revIvfCtes +
        ", " + revOutcomeCtes + " " +
        "SELECT b.q_id, b.hits_brute, " +
        "CAST(COALESCE(i.hits_ivf, 0) AS BIGINT) AS hits_ivf, " +
        "CASE WHEN COALESCE(i.hits_ivf, 0) > b.hits_brute THEN 'win' " +
        "WHEN COALESCE(i.hits_ivf, 0) < b.hits_brute THEN 'loss' " +
        "ELSE 'tie' END AS outcome " +
        "FROM revhb b LEFT JOIN revhi i USING (q_id) ORDER BY b.q_id"),
    // q436: the exact two-sided sign test per metric — the binomial
    // tail as an integer fraction (n ≤ 20 ⇒ 20! fits BIGINT), the
    // α = 0.05 verdict as the integer inequality 40·p_num ≤ p_den
    "q436_retrieval_signtest_summary" ->
      (OracleAnn.ivfModelCtes + ", " + revBase + ", " + revIvfCtes +
        ", " + revOutcomeCtes + ", " +
        "revo AS (SELECT * FROM revho UNION ALL SELECT * FROM revro), " +
        "revsg AS (SELECT metric, " +
        "CAST(SUM(CASE WHEN o = 'win' THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_wins, " +
        "CAST(SUM(CASE WHEN o = 'loss' THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_losses, " +
        "CAST(SUM(CASE WHEN o = 'tie' THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_ties FROM revo GROUP BY metric), " +
        "revsg2 AS (SELECT metric, n_wins, n_losses, n_ties, " +
        "n_wins + n_losses AS n_eff, " +
        "GREATEST(n_wins, n_losses) AS k_extreme FROM revsg), " +
        "revsg3 AS (SELECT *, " +
        "list_reduce(list_transform(range(k_extreme, n_eff + 1), " +
        "i -> CAST(factorial(CAST(n_eff AS INTEGER)) // " +
        "(factorial(CAST(i AS INTEGER)) * " +
        "factorial(CAST(n_eff - i AS INTEGER))) AS BIGINT)), " +
        "(a, b) -> a + b) AS p_num, " +
        "(CAST(1 AS BIGINT) << CAST(n_eff AS INTEGER)) AS p_den " +
        "FROM revsg2) " +
        "SELECT metric, n_wins, n_losses, n_ties, n_eff, k_extreme, " +
        "p_num, p_den, (40 * p_num <= p_den) AS significant_05 " +
        "FROM revsg3 ORDER BY metric"))
}
