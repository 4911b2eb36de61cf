package graft.oracles

/** DuckDB oracles for the data-contract family (q376–q380).
  *
  * The contract's column lists, declared keys, and domain rules are
  * mirrored statically here — an oracle can only certify a DECLARED
  * contract, and the declaration (like every oracle in this repo) is
  * pinned to the driver's fixture schema.
  *
  * CTE prefix `dc` is unique to this family.
  */
object OracleContracts {

  private val tableCols: Seq[(String, Seq[String])] = Seq(
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value",
      "props"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice"),
    "region" -> Seq("r_regionkey", "r_name"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"))

  private def completenessUnion(tables: Seq[(String, Seq[String])])
      : String =
    tables.flatMap { case (t, cs) =>
      cs.map(c =>
        s"SELECT '$t' AS tbl, '$c' AS col_name, COUNT(*) AS n_rows, " +
          s"CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
          s"AS n_nulls FROM $t")
    }.mkString(" UNION ALL ")

  private val completenessSql =
    s"SELECT * FROM (${completenessUnion(tableCols)}) dcall " +
      "ORDER BY tbl, col_name"

  /** Declared keys with severity (lineitem's composite key does NOT
    * hold on the fixture — declared at warn).
    */
  private val keys: Seq[(String, Seq[String], String)] = Seq(
    ("customer", Seq("c_custkey"), "error"),
    ("documents", Seq("doc_id"), "error"),
    ("embeddings", Seq("vec_id"), "error"),
    ("events", Seq("event_id"), "error"),
    ("lineitem", Seq("l_orderkey", "l_linenumber"), "warn"),
    ("nation", Seq("n_nationkey"), "error"),
    ("orders", Seq("o_orderkey"), "error"),
    ("part", Seq("p_partkey"), "error"),
    ("region", Seq("r_regionkey"), "error"),
    ("supplier", Seq("s_suppkey"), "error"))

  private val uniquenessUnion: String =
    keys.map { case (t, ks, sev) =>
      val kc = ks.mkString(", ")
      s"SELECT '$t' AS tbl, '${ks.mkString(",")}' AS key_cols, " +
        s"'$sev' AS severity, CAST(SUM(cnt) AS BIGINT) AS n_rows, " +
        "COUNT(*) AS n_keys, " +
        "CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_dup_keys FROM " +
        s"(SELECT $kc, COUNT(*) AS cnt FROM $t GROUP BY $kc) dck_$t"
    }.mkString(" UNION ALL ")

  private val uniquenessSql =
    s"SELECT * FROM ($uniquenessUnion) dcu ORDER BY tbl"

  /** Domain rules: (id, table, severity, violation predicate). */
  private val rules: Seq[(String, String, String, String)] = Seq(
    ("r01_doc_chars_positive", "documents", "error", "n_chars <= 0"),
    ("r02_doc_lang_nonempty", "documents", "error",
      "lang IS NULL OR length(lang) = 0"),
    ("r03_li_quantity_band", "lineitem", "error",
      "NOT (l_quantity BETWEEN 1 AND 50)"),
    ("r04_li_discount_band", "lineitem", "error",
      "NOT (l_discount BETWEEN 0 AND 0.1)"),
    ("r05_ord_total_positive", "orders", "error", "o_totalprice <= 0"),
    ("r06_part_size_band", "part", "error",
      "NOT (p_size BETWEEN 1 AND 50)"),
    ("r07_event_year_band", "events", "error",
      "NOT (YEAR(ts) BETWEEN 2020 AND 2030)"),
    ("r08_cust_bal_nonneg", "customer", "warn", "c_acctbal < 0"),
    ("r09_doc_min_len", "documents", "warn", "n_chars < 100"))

  private val domainSql =
    ("SELECT * FROM (" + rules.map { case (id, t, sev, viol) =>
      s"SELECT '$id' AS rule_id, '$t' AS tbl, '$sev' AS severity, " +
        s"(SELECT COUNT(*) FROM $t) AS n_checked, " +
        s"CAST(SUM(CASE WHEN $viol THEN 1 ELSE 0 END) AS BIGINT) " +
        s"AS n_violations FROM $t"
    }.mkString(" UNION ALL ") + ") dcr ORDER BY rule_id")

  private val gateSql =
    s"WITH dcc AS (${completenessUnion(tableCols)}), " +
      s"dcuq AS ($uniquenessUnion), " +
      "dcparts AS (" +
      "SELECT COUNT(*) AS n, " +
      "CAST(SUM(CASE WHEN n_nulls > 0 THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS viol, CAST(0 AS BIGINT) AS warnviol FROM dcc " +
      "UNION ALL SELECT COUNT(*), " +
      "CAST(SUM(CASE WHEN n_dup_keys > 0 AND severity = 'error' " +
      "THEN 1 ELSE 0 END) AS BIGINT), " +
      "CAST(SUM(CASE WHEN n_dup_keys > 0 AND severity = 'warn' " +
      "THEN 1 ELSE 0 END) AS BIGINT) FROM dcuq " +
      "UNION ALL SELECT COUNT(*), " +
      "CAST(SUM(CASE WHEN n_violations > 0 AND severity = 'error' " +
      "THEN 1 ELSE 0 END) AS BIGINT), " +
      "CAST(SUM(CASE WHEN n_violations > 0 AND severity = 'warn' " +
      "THEN 1 ELSE 0 END) AS BIGINT) FROM (" +
      rules.map { case (_, t, sev, viol) =>
        s"SELECT '$sev' AS severity, " +
          s"CAST(SUM(CASE WHEN $viol THEN 1 ELSE 0 END) AS BIGINT) " +
          s"AS n_violations FROM $t"
      }.mkString(" UNION ALL ") + ") dcrg) " +
      "SELECT CAST(SUM(n) AS BIGINT) AS n_rules, " +
      "CAST(SUM(viol) AS BIGINT) AS n_error_violations, " +
      "CAST(SUM(warnviol) AS BIGINT) AS n_warn_violations, " +
      "CASE WHEN SUM(viol) = 0 THEN 'PASS' ELSE 'FAIL' END AS gate " +
      "FROM dcparts"

  val sql: Map[String, String] = Map(
    "q376_completeness" -> completenessSql,
    // q379: q376's documents rows per micro-batch — the cells
    // sum-merge, so the DOCUMENTS fragment of the same union is the
    // oracle under any batching
    "q379_streaming_completeness" ->
      (s"SELECT * FROM (${completenessUnion(
        tableCols.filter(_._1 == "documents"))}) dcdoc " +
        "ORDER BY col_name"),
    "q377_key_uniqueness" -> uniquenessSql,
    "q378_domain_audit" -> domainSql,
    "q380_contract_gate" -> gateSql,
    // q393: the gate off MAINTAINED documents state (completeness
    // cells, key-grain counts, rule cells all merge exactly), so the
    // batch gate's SQL is the oracle verbatim under any batching
    "q393_streaming_contract_gate" -> gateSql,
    // q496: gated-commit manifest under the VERSIONED catalog — per
    // stream position: the catalog in force (v0 at position 0, v1
    // from position 1), the cumulative committed/quarantined split
    // with each batch gated at ITS OWN catalog's floor (100 then
    // 150), and the independent arrival count (id-range prefix)
    "q496_gated_commit_manifest" ->
      (GatedCtes +
        ", gcv AS (SELECT CAST(v AS BIGINT) AS version FROM " +
        "(VALUES (0), (1), (2)) t(v)) " +
        "SELECT gcv.version, gcv.version AS batch_id, " +
        "CAST(CASE WHEN gcv.version = 0 THEN 0 ELSE 1 END AS BIGINT) " +
        "AS catalog_version, " +
        "CAST(SUM(CASE WHEN gcd.b <= gcv.version AND " +
        "gcd.rule IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS " +
        "n_committed, " +
        "CAST(SUM(CASE WHEN gcd.b <= gcv.version AND " +
        "gcd.rule IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS " +
        "n_quarantined, " +
        "CAST(SUM(CASE WHEN gcd.b <= gcv.version THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_arrived " +
        "FROM gcv CROSS JOIN gcd GROUP BY gcv.version " +
        "ORDER BY gcv.version"),
    // q497: the dead-letter census — what the gate refused, per
    // (source, rule, catalog version): the same doc range quarantines
    // under catalog 0 at position 0 and catalog 1 later, so the
    // version column separates real contract texts
    "q497_dead_letter_census" ->
      (GatedCtes +
        "SELECT source, rule, " +
        "CAST(CASE WHEN b = 0 THEN 0 ELSE 1 END AS BIGINT) AS " +
        "catalog_version, " +
        "CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM gcd " +
        "WHERE rule IS NOT NULL " +
        "GROUP BY source, rule, catalog_version " +
        "ORDER BY source, rule, catalog_version"),
    // q514: warn rules annotate WITHOUT quarantining — the committed
    // head grouped by its warns column ('' = clean)
    "q514_gated_warn_annotations" ->
      (GatedCtes +
        "SELECT CASE WHEN n_chars < 200 THEN 'rw_doc_short' ELSE '' " +
        "END AS warns, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM gcd " +
        "WHERE rule IS NULL GROUP BY warns ORDER BY warns"))

  /** Shared gated-commit CTEs: the 3-batch id-range split and each
    * row's first-violated error rule AT ITS OWN BATCH'S catalog
    * (r01 positive length, r02 non-empty lang, r09 floor 100 at
    * position 0 / 150 after) — NULL rule = committed.
    */
  private def GatedCtes: String =
    "WITH gcm AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi " +
      "FROM documents), " +
      "gcd AS (SELECT d.source, CAST(d.n_chars AS BIGINT) AS n_chars, " +
      "LEAST((d.doc_id - m.lo) // ((m.hi - m.lo + 3) // 3), 2) AS b, " +
      "CASE WHEN d.n_chars IS NULL OR d.n_chars <= 0 " +
      "THEN 'r01_doc_chars_positive' " +
      "WHEN d.lang IS NULL OR LENGTH(d.lang) = 0 " +
      "THEN 'r02_doc_lang_nonempty' " +
      "WHEN d.n_chars < (CASE WHEN LEAST((d.doc_id - m.lo) // " +
      "((m.hi - m.lo + 3) // 3), 2) = 0 THEN 100 ELSE 150 END) " +
      "THEN 'r09_doc_min_len' END AS rule " +
      "FROM documents d, gcm m) "
}
