package graft.oracles

/** DuckDB oracles for the layout/skew advisors (q416–q418). All
  * integer div arithmetic. CTE prefix `lay` is unique to this family.
  */
object OracleLayout {

  val sql: Map[String, String] = Map(
    // q416: per-source writer plan at a 250k-char file payload
    "q416_partition_plan" ->
      ("WITH lays AS (SELECT source, COUNT(*) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM documents " +
        "GROUP BY source), " +
        "layf AS (SELECT source, n_docs, n_chars, " +
        "(n_chars + 249999) // 250000 AS n_files FROM lays) " +
        "SELECT source, CAST(n_docs AS BIGINT) AS n_docs, n_chars, " +
        "CAST(n_files AS BIGINT) AS n_files, " +
        "CAST(n_docs // n_files AS BIGINT) AS docs_per_file, " +
        "CAST(n_chars // n_files AS BIGINT) AS chars_per_file " +
        "FROM layf ORDER BY source"),
    // q417: hot event_type keys and their salt fan-out at cap 100
    "q417_salt_plan" ->
      ("SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST((COUNT(*) + 99) // 100 AS BIGINT) AS salt " +
        "FROM events GROUP BY event_type HAVING COUNT(*) > 100 " +
        "ORDER BY n_rows DESC, event_type"),
    // q418: per relation, shuffle tasks at 50k rows/task (floor 1)
    "q418_shuffle_advisor" ->
      ("SELECT * FROM (" +
        Seq("customer", "documents", "embeddings", "events",
          "lineitem", "orders").map { t =>
          s"SELECT '$t' AS relation, " +
            "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
            "CAST(GREATEST(1, (COUNT(*) + 49999) // 50000) AS BIGINT) " +
            s"AS n_tasks FROM $t"
        }.mkString(" UNION ALL ") +
        ") ORDER BY relation"),
    // q477: per-column documents statistics (the ANALYZE artifact)
    "q477_table_stats" ->
      ("SELECT * FROM (" +
        Seq("doc_id", "lang", "source", "n_chars", "text").map { c =>
          s"SELECT '$c' AS column_name, " +
            "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
            s"CAST(COUNT(DISTINCT $c) AS BIGINT) AS ndv, " +
            s"CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS " +
            "BIGINT) AS n_nulls, " +
            s"CAST(SUM(LENGTH(CAST($c AS VARCHAR))) * 100 // " +
            "COUNT(*) AS BIGINT) AS avg_len_x100 FROM documents"
        }.mkString(" UNION ALL ") +
        ") ORDER BY column_name"))
}
