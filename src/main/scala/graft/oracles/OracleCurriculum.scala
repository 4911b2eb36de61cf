package graft.oracles

/** DuckDB oracles for the curriculum/curation-budget family
  * (q394–q398).
  *
  * The ordering key is exact integer millis —
  * `(distinct_tokens * 1000) // tokens` — so every window ORDER BY is
  * FP-free; phases are the fixed 375/475/625 bands; shard is the
  * q101/q178 md5 first-hex convention; the optimizer's density is one
  * double division of exactly-summed longs per source.
  *
  * CTE prefix `cur` is unique to this family.
  */
object OracleCurriculum {

  /** Tokenized + scored base: curt (token lists), curp (score, phase,
    * shard per doc).
    */
  private val curBase =
    "curt AS (SELECT doc_id, source, " +
      "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
      "AS toks FROM documents), " +
      "curp AS (SELECT doc_id, source, " +
      "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard, " +
      "CAST(len(toks) AS BIGINT) AS n_tokens, " +
      "CAST((len(list_distinct(toks)) * 1000) // len(toks) AS BIGINT) " +
      "AS score, " +
      "CAST(CASE WHEN (len(list_distinct(toks)) * 1000) // len(toks) " +
      "< 375 THEN 0 WHEN (len(list_distinct(toks)) * 1000) // " +
      "len(toks) < 475 THEN 1 WHEN (len(list_distinct(toks)) * 1000) " +
      "// len(toks) < 625 THEN 2 ELSE 3 END AS BIGINT) AS phase " +
      "FROM curt WHERE len(toks) > 0)"

  private val phasesSql =
    s"WITH $curBase " +
      "SELECT phase, COUNT(*) AS n_docs, " +
      "CAST(SUM(n_tokens) AS BIGINT) AS n_tokens, " +
      "CAST(SUM(n_tokens) AS DOUBLE) / " +
      "CAST(SUM(SUM(n_tokens)) OVER () AS DOUBLE) AS token_share " +
      "FROM curp GROUP BY phase ORDER BY phase"

  val sql: Map[String, String] = Map(
    // q394: docs/tokens/share per fixed score band
    "q394_curriculum_phases" -> phasesSql,
    // q395: per (phase, shard) deterministic order with running token
    // offset — ties break on doc_id
    "q395_curriculum_manifest" ->
      (s"WITH $curBase " +
        "SELECT phase, shard, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY phase, shard " +
        "ORDER BY score, doc_id) AS BIGINT) AS pos, " +
        "doc_id, score, n_tokens, " +
        "CAST(SUM(n_tokens) OVER (PARTITION BY phase, shard " +
        "ORDER BY score, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) " +
        "AS cum_tokens " +
        "FROM curp ORDER BY phase, shard, pos"),
    // q396: fractional-knapsack greedy — densest source first until
    // half the corpus's tokens are spent; the marginal source partial
    "q396_curation_optimizer" ->
      ("WITH curt AS (SELECT doc_id, source, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
        "curf AS (SELECT source, CAST(len(toks) AS BIGINT) AS n_tokens, " +
        "(len(toks) >= 20 AND " +
        "CAST(len(list_distinct(toks)) AS DOUBLE) / " +
        "CAST(len(toks) AS DOUBLE) > 0.1 AND " +
        "CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) " +
        "AS DOUBLE) / CAST(len(toks) AS DOUBLE) < 0.5) AS pass " +
        "FROM curt WHERE len(toks) > 0), " +
        "cursc AS (SELECT source, " +
        "CAST(SUM(n_tokens) AS BIGINT) AS n_tokens, " +
        "CAST(SUM(CASE WHEN pass THEN n_tokens ELSE 0 END) AS BIGINT) " +
        "AS n_pass_tokens FROM curf GROUP BY source), " +
        "curtt AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 2 " +
        "AS budget FROM cursc), " +
        "curw AS (SELECT source, n_tokens, n_pass_tokens, " +
        "CAST(n_pass_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) " +
        "AS density, " +
        "CAST(ROW_NUMBER() OVER (ORDER BY " +
        "CAST(n_pass_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) " +
        "DESC, source) AS BIGINT) AS step, " +
        "CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY " +
        "CAST(n_pass_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) " +
        "DESC, source ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "1 PRECEDING), 0) AS BIGINT) AS cum_before FROM cursc), " +
        "curg AS (SELECT step, source, n_tokens, n_pass_tokens, " +
        "density, LEAST(n_tokens, GREATEST(CAST(0 AS BIGINT), " +
        "(SELECT budget FROM curtt) - cum_before)) AS take_tokens, " +
        "cum_before FROM curw) " +
        "SELECT step, source, n_tokens, n_pass_tokens, density, " +
        "CAST(take_tokens AS BIGINT) AS take_tokens, " +
        "CAST(cum_before + take_tokens AS BIGINT) AS cum_tokens " +
        "FROM curg WHERE take_tokens > 0 ORDER BY step"),
    // q397: the phase cells sum-merge — q394's SQL verbatim
    "q397_streaming_curriculum_mass" -> phasesSql,
    // q398: q178's chop in curriculum order, per-shard rollup; the
    // boundary-crossing count is what the ordering changes
    "q398_curriculum_packed" ->
      (s"WITH $curBase, " +
        "curo AS (SELECT shard, phase, score, doc_id, n_tokens, " +
        "CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard " +
        "ORDER BY phase, score, doc_id ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off " +
        "FROM curp) " +
        "SELECT shard, " +
        "CAST(MAX((off + n_tokens - 1) // 64 + 1) AS BIGINT) AS n_seqs, " +
        "COUNT(*) AS n_docs, " +
        "CAST(SUM(CASE WHEN off // 64 <> (off + n_tokens - 1) // 64 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_cross, " +
        "CAST(SUM(n_tokens) AS BIGINT) AS n_tokens " +
        "FROM curo GROUP BY shard ORDER BY shard"))
}
