package graft.oracles

/** DuckDB oracles for the k-anonymity / l-diversity audit
  * (q444–q446). Pure grouping/counting over the customer QI
  * projection; CTE prefix `an` is unique to this family.
  */
object OracleAnonymity {

  private val Base =
    "WITH anc AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS " +
      "nation, CAST(n_regionkey AS BIGINT) AS region, c_mktsegment " +
      "AS segment, c_acctbal FROM customer JOIN nation ON " +
      "c_nationkey = n_nationkey) "

  val sql: Map[String, String] = Map(
    // q444: level-0 k<5 violation work list
    "q444_kanon_audit" ->
      (Base +
        "SELECT nation AS qi_geo, segment AS qi_seg, " +
        "CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS qi_bal, " +
        "CAST(COUNT(*) AS BIGINT) AS class_size " +
        "FROM anc GROUP BY 1, 2, 3 HAVING COUNT(*) < 5 " +
        "ORDER BY qi_geo, qi_seg, qi_bal"),
    // q445: the generalization ladder with the release decision
    "q445_kanon_generalize" ->
      (Base +
        ", anl AS (SELECT 0::BIGINT AS level, nation AS qi_geo, " +
        "segment AS qi_seg, CAST(FLOOR(c_acctbal/1000.0) AS BIGINT) " +
        "AS qi_bal FROM anc " +
        "UNION ALL SELECT 1, region, segment, " +
        "CAST(FLOOR(c_acctbal/2500.0) AS BIGINT) FROM anc " +
        "UNION ALL SELECT 2, region, segment, " +
        "CAST(FLOOR(c_acctbal/5000.0) AS BIGINT) FROM anc " +
        "UNION ALL SELECT 3, region, '*', " +
        "CAST(FLOOR(c_acctbal/5000.0) AS BIGINT) FROM anc), " +
        "ang AS (SELECT level, qi_geo, qi_seg, qi_bal, " +
        "CAST(COUNT(*) AS BIGINT) AS class_size FROM anl " +
        "GROUP BY 1,2,3,4), " +
        "anp AS (SELECT level, CAST(COUNT(*) AS BIGINT) AS n_classes, " +
        "MIN(class_size) AS min_class_size, " +
        "CAST(SUM(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS " +
        "BIGINT) AS n_violating_classes, " +
        "CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 " +
        "END) AS BIGINT) AS n_violating_rows FROM ang GROUP BY level), " +
        "anch AS (SELECT COALESCE(MIN(level), -1) AS chosen_level " +
        "FROM anp WHERE n_violating_classes = 0) " +
        "SELECT p.level, p.n_classes, p.min_class_size, " +
        "p.n_violating_classes, p.n_violating_rows, " +
        "(p.level = c.chosen_level) AS chosen " +
        "FROM anp p, anch c ORDER BY p.level"),
    // q446: homogeneous classes at the (nation, bal) adversary keys —
    // attribute disclosure of the segment without re-identification
    "q446_ldiversity" ->
      (Base +
        "SELECT nation AS qi_geo, " +
        "CAST(FLOOR(c_acctbal/1000.0) AS BIGINT) AS qi_bal, " +
        "CAST(COUNT(*) AS BIGINT) AS class_size, " +
        "CAST(COUNT(DISTINCT segment) AS BIGINT) AS l_distinct " +
        "FROM anc GROUP BY 1, 2 HAVING COUNT(DISTINCT segment) < 2 " +
        "ORDER BY qi_geo, qi_bal"))

  /** q458: the suppression-release census at level 2. */
  val releaseSql: Map[String, String] = Map(
    "q458_kanon_release" ->
      ("WITH anc AS (SELECT CAST(n_regionkey AS BIGINT) AS region, " +
        "c_mktsegment AS segment, c_acctbal FROM customer JOIN " +
        "nation ON c_nationkey = n_nationkey), " +
        "ang AS (SELECT region AS qi_geo, segment AS qi_seg, " +
        "CAST(FLOOR(c_acctbal/5000.0) AS BIGINT) AS qi_bal, " +
        "CAST(COUNT(*) AS BIGINT) AS class_size FROM anc " +
        "GROUP BY 1, 2, 3) " +
        "SELECT qi_geo, " +
        "CAST(SUM(CASE WHEN class_size >= 5 THEN 1 ELSE 0 END) AS " +
        "BIGINT) AS n_released_classes, " +
        "CAST(SUM(CASE WHEN class_size >= 5 THEN class_size ELSE 0 " +
        "END) AS BIGINT) AS n_released_rows, " +
        "CAST(SUM(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS " +
        "BIGINT) AS n_suppressed_classes, " +
        "CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 " +
        "END) AS BIGINT) AS n_suppressed_rows " +
        "FROM ang GROUP BY qi_geo ORDER BY qi_geo"))

  /** The streaming twins (q455–q456) drain ONE maintained QI cell
    * state into the same facets, so the batch SQL is their oracle for
    * any micro-batching (the twin contract).
    */
  val streamingSql: Map[String, String] = Map(
    "q455_streaming_kanon" -> sql("q445_kanon_generalize"),
    "q456_streaming_ldiversity" -> sql("q446_ldiversity"))
}
