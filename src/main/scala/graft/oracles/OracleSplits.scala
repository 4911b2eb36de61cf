package graft.oracles

/** DuckDB oracles for the split-hygiene family (q360–q364).
  *
  * All assignment arithmetic is q136's byte rule
  * (md5('split|' || CAST(id AS VARCHAR)), first two nibbles as
  * 0..255, < 204 train / < 230 val / else test), applied to the doc
  * id or to the q193 component label. The edge relation is the same
  * md5 banding chain as q95 ([[OracleDedup.dupGraphCte]]); the
  * component labeling is the same recursive min-label closure as q193
  * ([[OracleDedup.q193ClusterCtes]]).
  *
  * CTE prefix `spl` is unique to this family (shared-prefix hygiene).
  */
object OracleSplits {

  /** q136's byte rule on an expression, as a CASE column. */
  private def splSplitOf(x: String): String = {
    val hk = s"md5('split|' || CAST($x AS VARCHAR))"
    val bb = s"(strpos('0123456789abcdef', substr($hk, 1, 1)) - 1) " +
      s"* 16 + strpos('0123456789abcdef', substr($hk, 2, 1)) - 1"
    s"CASE WHEN $bb < 204 THEN 'train' WHEN $bb < 230 THEN 'val' " +
      "ELSE 'test' END"
  }

  /** (doc_id, source, n_chars, split) under the doc-hash rule. */
  private val splDocCte =
    "spls AS (SELECT doc_id, source, n_chars, " +
      splSplitOf("doc_id") + " AS split FROM documents)"

  private val splMassSql =
    s"WITH $splDocCte " +
      "SELECT source, split, COUNT(*) AS n_docs, " +
      "CAST(SUM(n_chars) AS BIGINT) AS n_chars_total " +
      "FROM spls GROUP BY source, split ORDER BY source, split"

  /** (doc_id, cluster, split) under the group rule — rides the q193
    * recursive closure; MATERIALIZED because three consumers reference
    * it (both leak-join sides and the rollup).
    */
  private val splGroupCte =
    "splgs AS MATERIALIZED (SELECT d.doc_id, cl.cluster, " +
      splSplitOf("cl.cluster") + " AS split " +
      "FROM documents d JOIN cl ON cl.id = d.doc_id)"

  val sql: Map[String, String] = Map(
    // q360: the training-mix mass table
    "q360_split_mass" -> splMassSql,
    // q364: q360 per micro-batch off the (source, split, kind) cells
    "q364_streaming_split_mass" -> splMassSql,
    // q361: verified near-dup pairs bucketed by the split pair they
    // straddle (ed = the q95 verified edge relation, id_a < id_b)
    "q361_split_leakage_matrix" ->
      (OracleDedup.dupGraphCte + ", " + splDocCte + ", " +
        "splm AS (SELECT least(x.split, y.split) AS split_lo, " +
        "greatest(x.split, y.split) AS split_hi, ed.a, ed.b " +
        "FROM ed JOIN spls x ON x.doc_id = ed.a " +
        "JOIN spls y ON y.doc_id = ed.b), " +
        "splc AS (SELECT split_lo, split_hi, COUNT(*) AS n_pairs " +
        "FROM splm GROUP BY split_lo, split_hi), " +
        "splu AS (SELECT split_lo, split_hi, " +
        "CAST(COUNT(DISTINCT d) AS BIGINT) AS n_docs FROM " +
        "(SELECT split_lo, split_hi, a AS d FROM splm " +
        "UNION ALL SELECT split_lo, split_hi, b AS d FROM splm) splq " +
        "GROUP BY split_lo, split_hi) " +
        "SELECT splc.split_lo, splc.split_hi, splc.n_pairs, splu.n_docs " +
        "FROM splc JOIN splu USING (split_lo, split_hi) " +
        "ORDER BY split_lo, split_hi"),
    // q362: per-split docs/clusters under the group rule + the
    // cross-split edge count (computed over pj, driven to 0 by
    // construction)
    "q362_group_safe_split" ->
      (OracleDedup.q193ClusterCtes + ", " + splGroupCte + ", " +
        "splleak AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pj " +
        "JOIN splgs x ON x.doc_id = pj.id_a " +
        "JOIN splgs y ON y.doc_id = pj.id_b WHERE x.split <> y.split) " +
        "SELECT split, COUNT(*) AS n_docs, " +
        "CAST(COUNT(DISTINCT cluster) AS BIGINT) AS n_clusters, " +
        "(SELECT n FROM splleak) AS n_leak_pairs " +
        "FROM splgs GROUP BY split ORDER BY split"),
    // q363: doc-hash → group-safe transition matrix
    "q363_split_migration" ->
      (OracleDedup.q193ClusterCtes + ", " + splGroupCte + ", " +
        splDocCte + " " +
        "SELECT spls.split AS split_from, splgs.split AS split_to, " +
        "COUNT(*) AS n_docs FROM spls JOIN splgs USING (doc_id) " +
        "GROUP BY split_from, split_to ORDER BY split_from, split_to"))
}
