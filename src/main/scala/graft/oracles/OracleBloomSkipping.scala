package graft.oracles

/** DuckDB oracles for bloom file skipping + MV rewrite (q466–q467).
  * The 12-bit hash decodes three md5 hex nibbles by strpos (the q253
  * deterministic-model discipline); Spark's `conv(substring(md5,1,3),
  * 16, 10)` computes the identical value. CTE prefix `bs`.
  */
object OracleBloomSkipping {

  /** 12-bit decode of the first 3 hex nibbles of `e`. */
  private def dec(e: String): String =
    s"((strpos('0123456789abcdef', substr($e, 1, 1)) - 1) * 256 + " +
      s"(strpos('0123456789abcdef', substr($e, 2, 1)) - 1) * 16 + " +
      s"(strpos('0123456789abcdef', substr($e, 3, 1)) - 1))"

  private def h(salt: String): String =
    dec(s"md5('$salt|' || CAST(o_custkey AS VARCHAR))")

  val sql: Map[String, String] = Map(
    // q466: per probe key, bloom-admitted vs truly-containing files
    "q466_bloom_file_skipping" ->
      ("WITH bso AS (SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS " +
        "o_custkey, (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) // " +
        "256 AS file_id FROM orders), " +
        "bsb AS (SELECT DISTINCT file_id, bit FROM (" +
        s"SELECT file_id, ${h("b1")} AS bit FROM bso " +
        s"UNION ALL SELECT file_id, ${h("b2")} FROM bso)), " +
        "bsp AS (SELECT DISTINCT (k.k * m.maxv) // 8 AS o_custkey " +
        "FROM (SELECT MAX(o_custkey) AS maxv FROM bso) m, " +
        "range(1, 9) k(k)), " +
        "bspb AS (SELECT DISTINCT o_custkey, bit FROM (" +
        s"SELECT o_custkey, ${h("b1")} AS bit FROM bsp " +
        s"UNION ALL SELECT o_custkey, ${h("b2")} FROM bsp)), " +
        "bsn AS (SELECT o_custkey, COUNT(*) AS n_bits FROM bspb " +
        "GROUP BY 1), " +
        "bsh AS (SELECT pb.o_custkey, b.file_id, COUNT(*) AS n_hit " +
        "FROM bsb b JOIN bspb pb ON b.bit = pb.bit GROUP BY 1, 2), " +
        "bsa AS (SELECT hh.o_custkey, CAST(COUNT(*) AS BIGINT) AS " +
        "n_admitted FROM bsh hh JOIN bsn n ON hh.o_custkey = " +
        "n.o_custkey WHERE hh.n_hit = n.n_bits GROUP BY 1), " +
        "bst AS (SELECT o.o_custkey, CAST(COUNT(DISTINCT o.file_id) " +
        "AS BIGINT) AS n_true FROM bso o JOIN bsp p ON o.o_custkey = " +
        "p.o_custkey GROUP BY 1) " +
        "SELECT p.o_custkey AS probe_key, " +
        "COALESCE(a.n_admitted, 0) AS n_admitted, " +
        "COALESCE(t.n_true, 0) AS n_true, " +
        "COALESCE(a.n_admitted, 0) - COALESCE(t.n_true, 0) AS " +
        "n_false_positive FROM bsp p " +
        "LEFT JOIN bsa a ON p.o_custkey = a.o_custkey " +
        "LEFT JOIN bst t ON p.o_custkey = t.o_custkey " +
        "ORDER BY probe_key"),
    // q467: both answer paths recomputed through the MV grain
    "q467_mv_rewrite_parity" ->
      ("WITH bsm AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) " +
        "AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM " +
        "documents GROUP BY 1, 2) " +
        "SELECT m.source, m.n_docs_mv, b.n_docs_base, m.n_chars_mv, " +
        "b.n_chars_base FROM (" +
        "SELECT source, CAST(SUM(n_docs) AS BIGINT) AS n_docs_mv, " +
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars_mv FROM bsm " +
        "GROUP BY source) m JOIN (" +
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_base, " +
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars_base FROM documents " +
        "GROUP BY source) b ON m.source = b.source ORDER BY m.source"))
}
