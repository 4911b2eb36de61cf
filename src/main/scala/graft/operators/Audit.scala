package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Physical-design audit tables — the two reports an operator reads
  * BEFORE planning joins at 100 TB: which foreign keys are actually
  * clean (so a join's null/orphan semantics are known up front) and
  * how skewed each join key's multiplicity is (so the salting /
  * broadcast / AQE-skew decision is data-driven, not guessed). The
  * reference validates referential shape row-by-row while upserting
  * (`src/services/saveToPostgres.js:1-527` checks each FK target
  * before writing); these are the corpus-wide set-at-once versions
  * of those per-row checks.
  *
  * Both reports collapse the child table to KEY grain first (one
  * map-side-combined count per key), so nothing downstream ever
  * touches row grain again: the anti joins and the stats run over
  * |distinct keys| rows, and the outputs are #relations /
  * #audited-keys rows.
  */
object Audit {

  /** One relation's orphan profile: child collapsed to (key, cnt),
    * left-anti against the distinct parent key set. A null child key
    * never matches (kept as orphan) in BOTH engines — Spark's
    * `left_anti` and the oracle's LEFT JOIN ... IS NULL agree on the
    * null-FK convention.
    */
  private[graft] def orphanProfile(child: DataFrame, key: String,
      parent: DataFrame, pkey: String, rel: String): DataFrame = {
    val childKeys = child.groupBy(col(key).as("k"))
      .agg(count(lit(1)).as("cnt"))
    val orphan = childKeys.join(
      parent.select(col(pkey).as("k")).distinct(), Seq("k"), "left_anti")
    val totals = childKeys.agg(
      sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"))
    val orph = orphan.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("n_orphan_rows"),
      count(lit(1)).as("n_orphan_keys"))
    totals.crossJoin(orph).select(lit(rel).as("relation"),
      col("n_rows"), col("n_keys"), col("n_orphan_keys"),
      col("n_orphan_rows"))
  }

  /** q293 — referential-integrity audit over every FK edge of the
    * schema: per relation, child rows/keys and orphaned keys/rows
    * (child keys with no parent). 100 TB shape: each edge is one
    * key-grain collapse (map-side combined) + one key-grain anti join
    * (small parents broadcast by AQE; orders-scale parents shuffle
    * KEYS, never child rows); output is #edges rows.
    */
  def fkIntegrity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val part = Tables.part(spark, dir)
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    orphanProfile(li, "l_orderkey", ord, "o_orderkey",
        "lineitem.l_orderkey->orders")
      .unionAll(orphanProfile(li, "l_partkey", part, "p_partkey",
        "lineitem.l_partkey->part"))
      .unionAll(orphanProfile(li, "l_suppkey", supp, "s_suppkey",
        "lineitem.l_suppkey->supplier"))
      .unionAll(orphanProfile(ord, "o_custkey", cust, "c_custkey",
        "orders.o_custkey->customer"))
      .unionAll(orphanProfile(cust, "c_nationkey", nat, "n_nationkey",
        "customer.c_nationkey->nation"))
      .unionAll(orphanProfile(supp, "s_nationkey", nat, "n_nationkey",
        "supplier.s_nationkey->nation"))
      .unionAll(orphanProfile(nat, "n_regionkey", reg, "r_regionkey",
        "nation.n_regionkey->region"))
      .orderBy(col("relation"))
  }

  /** One key's multiplicity stats off the key-grain collapse. */
  private[graft] def keyStats(df: DataFrame, key: String, name: String)
      : DataFrame =
    df.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_mult"))
      .select(lit(name).as("key_name"), col("n_rows"), col("n_keys"),
        col("max_mult"),
        (col("n_rows").cast("double") / col("n_keys").cast("double"))
          .as("avg_mult"),
        (col("max_mult").cast("double") / col("n_rows").cast("double"))
          .as("max_share"))

  /** q294 — join-key skew planner: per audited join key, row count,
    * distinct keys, the heaviest key's multiplicity, mean
    * multiplicity, and the heaviest key's share of all rows. This is
    * the table behind the q19/q59 salting decision and the
    * AQE-skew-join threshold: `max_mult × row-width` versus executor
    * memory says whether the biggest shuffle bucket fits, BEFORE the
    * job runs. 100 TB shape: one map-side-combined count per key per
    * audited column, then a 3-value fold per key — output is
    * #audited-keys rows; no row-grain data ever moves.
    */
  def joinKeySkew(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ev = Tables.events(spark, dir)
    keyStats(li, "l_orderkey", "lineitem.l_orderkey")
      .unionAll(keyStats(li, "l_partkey", "lineitem.l_partkey"))
      .unionAll(keyStats(li, "l_suppkey", "lineitem.l_suppkey"))
      .unionAll(keyStats(Tables.orders(spark, dir), "o_custkey",
        "orders.o_custkey"))
      .unionAll(keyStats(ev, "user_id", "events.user_id"))
      .unionAll(keyStats(ev, "event_type", "events.event_type"))
      .unionAll(keyStats(Tables.documents(spark, dir), "source",
        "documents.source"))
      .orderBy(col("key_name"))
  }

  /** q299 — exact Gini concentration of activity and spend: how
    * unequally events / cents / orders are distributed over their
    * keys. Gini needs the rank-weighted sum Σ i·x_(i) over the SORTED
    * per-key values — a full key-grain sort at 100 TB if done
    * naively. Instead the keys collapse to their value HISTOGRAM
    * (value v, multiplicity m): inside a tie group every permutation
    * has the same rank-sum, so the group contributes
    * v·(m·R + m(m+1)/2) with R = keys before the group — and R comes
    * from the q205 two-phase prefix sum over the VALUE grain
    * (range-partition by v, per-partition prefix in parallel,
    * #partitions offsets through the driver). The weighted sums run
    * in decimal(38,0) (Σ i·x overflows BIGINT near corpus scale —
    * the oracle uses HUGEINT for the same reason); Gini is ONE final
    * division: (2·Σi·x − (n+1)·Σx) / (n·Σx).
    */
  def activityGini(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val evCounts = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("x"))
    val cents = ev.groupBy(col("user_id"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100)
        .cast("long").as("x"))
    val ordCounts = Tables.orders(spark, dir).groupBy(col("o_custkey"))
      .agg(count(lit(1)).cast("long").as("x"))
    giniOf(spark, evCounts, "events_per_user")
      .unionAll(giniOf(spark, cents, "cents_per_user"))
      .unionAll(giniOf(spark, ordCounts, "orders_per_customer"))
      .orderBy(col("entity"))
  }

  private val dec = "decimal(38,0)"

  /** The shared rank machinery behind q299/q304: collapse a per-key
    * value relation to its value HISTOGRAM (x, m), then attach each
    * tie group's rank base `rbase` (keys strictly below) and value
    * base `cb` (value mass strictly below) via the q205 two-phase
    * prefix sum over the VALUE grain — range-partition by x,
    * per-partition prefixes in parallel, #partitions offsets through
    * the driver. Never sorts key grain.
    */
  private[graft] def rankedValueHistogram(spark: SparkSession,
      perKey: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val byVal = perKey.groupBy(col("x")).agg(count(lit(1)).as("m"))
      .withColumn("xm", col("x").cast(dec) * col("m").cast(dec))
      .repartitionByRange(col("x"))
      .withColumn("pid", spark_partition_id())
      .persist()
    val totals = byVal.groupBy(col("pid"))
      .agg(sum(col("m")).as("pm"), sum(col("xm")).as("pxm"))
      .collect().sortBy(_.getAs[Int]("pid"))
    var accM = 0L
    var accX = BigDecimal(0)
    val offs = totals.map { r =>
      val o = (r.getAs[Int]("pid"), accM, accX)
      accM += r.getAs[Long]("pm")
      accX += BigDecimal(r.getAs[java.math.BigDecimal]("pxm"))
      o
    }.toSeq
    val offDf =
      if (offs.isEmpty)
        Seq((0, 0L, BigDecimal(0))).toDF("pid", "poff", "voff").limit(0)
      else offs.toDF("pid", "poff", "voff")
    val wLoc = Window.partitionBy(col("pid")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byVal
      .withColumn("locm", coalesce(sum(col("m")).over(wLoc), lit(0L)))
      .withColumn("locx",
        coalesce(sum(col("xm")).over(wLoc), lit(0).cast(dec)))
      .join(broadcast(offDf), "pid")
      .select(col("x"), col("m"), col("xm"),
        (col("locm") + col("poff")).as("rbase"),
        (col("locx") + col("voff").cast(dec)).cast(dec).as("cb"))
  }

  /** One Gini row off a per-key value relation (`x` column). */
  private[graft] def giniOf(spark: SparkSession, perKey: DataFrame,
      entity: String): DataFrame = {
    val ranked = rankedValueHistogram(spark, perKey)
      // m(m+1)/2 stays in longs: m is ONE value's multiplicity, whose
      // square fits long far past any real corpus's tie-group size
      .withColumn("tri", expr("(m * (m + 1)) div 2"))
    val agg = ranked.agg(
      sum(col("x").cast(dec) *
        (col("m").cast(dec) * col("rbase").cast(dec) +
          col("tri").cast(dec))).as("sw"),
      sum(col("m")).as("n"),
      sum(col("xm")).as("total"))
    agg.select(lit(entity).as("entity"),
      col("n").as("n_keys"),
      col("total").cast("long").as("total"),
      when(col("n") * col("total") === 0, lit(0.0))
        .otherwise(
          (lit(2).cast(dec) * col("sw") -
            (col("n") + 1L).cast(dec) * col("total")).cast("double") /
          (col("n").cast(dec) * col("total")).cast("double"))
        .as("gini"))
  }

  /** q304 — exact Lorenz curve deciles: at each key-count decile rank
    * r_d = ⌈d·n/10⌉ (keys ordered by ascending value), the cumulative
    * value mass and its share of the total — the curve whose area
    * deficit IS q299's Gini. Exact without a key-grain sort: inside a
    * tie group all values are equal, so the cumulative mass at any
    * rank r in the group is cb + (r − rbase)·x off the
    * [[rankedValueHistogram]] grain; the decile table (10 rows,
    * broadcast) range-joins the histogram. Same three entities as
    * q299.
    */
  def lorenzDeciles(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val evCounts = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("x"))
    val cents = ev.groupBy(col("user_id"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100)
        .cast("long").as("x"))
    val ordCounts = Tables.orders(spark, dir).groupBy(col("o_custkey"))
      .agg(count(lit(1)).cast("long").as("x"))
    lorenzOf(spark, evCounts, "events_per_user")
      .unionAll(lorenzOf(spark, cents, "cents_per_user"))
      .unionAll(lorenzOf(spark, ordCounts, "orders_per_customer"))
      .orderBy(col("entity"), col("decile"))
  }

  private def lorenzOf(spark: SparkSession, perKey: DataFrame,
      entity: String): DataFrame = {
    val ranked = rankedValueHistogram(spark, perKey)
    val agg = ranked.agg(sum(col("m")).as("n"), sum(col("xm")).as("total"))
    val decs = spark.range(1, 11).select(col("id").as("decile"))
      .crossJoin(agg)
      .select(col("decile"), col("n"), col("total"),
        expr("(decile * n + 9) div 10").as("r"))
    broadcast(decs).join(ranked,
        col("r") > col("rbase") && col("r") <= col("rbase") + col("m"))
      .select(lit(entity).as("entity"), col("decile"),
        col("r").as("rank"),
        (col("cb") + (col("r") - col("rbase")).cast(dec) *
          col("x").cast(dec)).cast("long").as("cum_value"),
        ((col("cb") + (col("r") - col("rbase")).cast(dec) *
          col("x").cast(dec)).cast("double") /
          col("total").cast("double")).as("share"))
  }

  // ---- data-contract expectations (q376–q380) -------------------
  //
  // The declared contract a training run is gated on, as data:
  // completeness (no unexpected nulls), key uniqueness, and domain
  // rules — each an audit TABLE, plus the one-row gate a CI job
  // reads. Severity is part of the contract: 'error' rules gate,
  // 'warn' rules report (the fixture itself carries warn-grade
  // findings — lineitem's composite key does not hold and negative
  // balances / short docs exist — so the reports are non-vacuous).

  /** Every contract table with its accessor — schema read at runtime
    * (events through the ts-normalizing reader; null counts are
    * type-invariant).
    */
  private def contractTables(spark: SparkSession, dir: String)
      : Seq[(String, DataFrame)] = Seq(
    "customer" -> Tables.customer(spark, dir),
    "documents" -> Tables.documents(spark, dir),
    "embeddings" -> Tables.embeddings(spark, dir),
    "events" -> Tables.events(spark, dir),
    "lineitem" -> Tables.lineitem(spark, dir),
    "nation" -> Tables.nation(spark, dir),
    "orders" -> Tables.orders(spark, dir),
    "part" -> Tables.part(spark, dir),
    "region" -> Tables.region(spark, dir),
    "supplier" -> Tables.supplier(spark, dir))

  /** Per-table (col, n_nulls) cells + row count in ONE pass (q379's
    * mergeable statistic for the documents stream: counts sum-merge).
    */
  private[graft] def completenessCellsOf(tbl: String, df: DataFrame)
      : DataFrame = {
    val cs = df.columns.toSeq
    val aggs = count(lit(1)).as("n_rows") +:
      cs.map(c => sum(when(col(c).isNull, 1L).otherwise(0L))
        .as(s"nn_$c"))
    df.agg(aggs.head, aggs.tail: _*)
      .select(lit(tbl).as("tbl"), col("n_rows"), expr(
        s"stack(${cs.size}, " +
          cs.map(c => s"'$c', nn_$c").mkString(", ") +
          ") as (col_name, n_nulls)"))
      .select(col("tbl"), col("col_name"), col("n_rows"),
        col("n_nulls"))
  }

  /** q379's cell form: documents completeness as (col_name, kind) →
    * cnt — rows and nulls both sum-merge per micro-batch.
    */
  private[graft] def docCompletenessCells(docs: DataFrame): DataFrame =
    completenessCellsOf("documents", docs)
      .select(col("col_name"), expr(
        "stack(2, 'rows', n_rows, 'nulls', n_nulls) as (kind, cnt)"))

  /** q379's drain: pivot the maintained cells back to the q376 row
    * shape (documents rows only).
    */
  private[graft] def completenessFromCells(cells: DataFrame): DataFrame = {
    def k(kind: String) =
      sum(when(col("kind") === kind, col("cnt")).otherwise(0L))
    cells.groupBy(col("col_name"))
      .agg(k("rows").as("n_rows"), k("nulls").as("n_nulls"))
      .select(lit("documents").as("tbl"), col("col_name"),
        col("n_rows"), col("n_nulls"))
      .orderBy(col("col_name"))
  }

  /** Column completeness audit (q376): per (table, column), row and
    * null counts over every contract table — one aggregate pass per
    * table, #columns rows out.
    */
  def completeness(spark: SparkSession, dir: String): DataFrame =
    contractTables(spark, dir)
      .map { case (t, df) => completenessCellsOf(t, df) }
      .reduce(_.unionByName(_))
      .orderBy(col("tbl"), col("col_name"))

  /** Declared keys. lineitem's composite is declared at WARN severity:
    * the classic PK does NOT hold on the synthetic fixture, which is
    * exactly the kind of silent modeling drift this audit exists to
    * surface (a join assuming it would silently duplicate rows).
    */
  private val declaredKeys: Seq[(String, Seq[String], String)] = Seq(
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

  /** One q377 row from a key-grain (…, cnt) frame. */
  private def keyRowOf(t: String, ks: Seq[String], sev: String,
      keyCounts: DataFrame): DataFrame =
    keyCounts
      .agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L))
          .as("n_dup_keys"))
      .select(lit(t).as("tbl"),
        lit(ks.mkString(",")).as("key_cols"),
        lit(sev).as("severity"),
        col("n_rows"), col("n_keys"), col("n_dup_keys"))

  /** Key uniqueness audit (q377): per declared key, row/key/dup-key
    * counts — key-grain collapse first, so the dup check is one
    * aggregate over |distinct keys| rows.
    */
  def keyUniqueness(spark: SparkSession, dir: String): DataFrame = {
    val byName = contractTables(spark, dir).toMap
    declaredKeys.map { case (t, ks, sev) =>
      keyRowOf(t, ks, sev,
        byName(t).groupBy(ks.map(col): _*)
          .agg(count(lit(1)).as("cnt")))
    }.reduce(_.unionByName(_)).orderBy(col("tbl"))
  }

  /** q393's key-grain state stat: (doc_id → cnt) — the distinct-merge
    * state key uniqueness needs (sum-merging per-batch counts makes a
    * cross-batch duplicate a cnt > 1 key at drain).
    */
  private[graft] def docKeyCells(docs: DataFrame): DataFrame =
    docs.groupBy(col("doc_id")).agg(count(lit(1)).as("cnt"))

  /** q393's drain of [[docKeyCells]]: the q377 documents row. */
  private[graft] def docKeyRowFromCells(cells: DataFrame): DataFrame =
    keyRowOf("documents", Seq("doc_id"), "error", cells)

  /** The declared domain rules: (rule_id, table, severity, violation
    * predicate). Error rules hold on the fixture by construction;
    * warn rules FIRE (negative balances, short docs) so the report
    * certifies real counting, not vacuous zeros.
    */
  private def domainRules
      : Seq[(String, String, String, org.apache.spark.sql.Column)] = Seq(
    ("r01_doc_chars_positive", "documents", "error",
      col("n_chars") <= 0),
    ("r02_doc_lang_nonempty", "documents", "error",
      col("lang").isNull || length(col("lang")) === 0),
    ("r03_li_quantity_band", "lineitem", "error",
      !col("l_quantity").between(1, 50)),
    ("r04_li_discount_band", "lineitem", "error",
      !col("l_discount").between(0, 0.1)),
    ("r05_ord_total_positive", "orders", "error",
      col("o_totalprice") <= 0),
    ("r06_part_size_band", "part", "error",
      !col("p_size").between(1, 50)),
    ("r07_event_year_band", "events", "error",
      !year(col("ts")).between(2020, 2030)),
    ("r08_cust_bal_nonneg", "customer", "warn",
      col("c_acctbal") < 0),
    ("r09_doc_min_len", "documents", "warn",
      col("n_chars") < 100))

  /** Domain-rule audit (q378): per rule, checked and violating row
    * counts — ONE lazy aggregate per rule (count + conditional sum),
    * never a separate eager count scan.
    */
  def domainAudit(spark: SparkSession, dir: String): DataFrame = {
    val byName = contractTables(spark, dir).toMap
    domainRules.map { case (id, t, sev, viol) =>
      byName(t).agg(count(lit(1)).as("n_checked"),
          sum(when(viol, 1L).otherwise(0L)).as("n_violations"))
        .select(lit(id).as("rule_id"), lit(t).as("tbl"),
          lit(sev).as("severity"), col("n_checked"),
          col("n_violations"))
    }.reduce(_.unionByName(_)).orderBy(col("rule_id"))
  }

  /** q393's documents-rule state stat: per documents rule,
    * (rule_id, kind ∈ checked/viol) → cnt — both counts sum-merge.
    */
  private[graft] def docDomainCells(docs: DataFrame): DataFrame =
    domainRules.filter(_._2 == "documents").map { case (id, _, _, viol) =>
      docs.agg(count(lit(1)).as("n_checked"),
          sum(when(viol, 1L).otherwise(0L)).as("n_violations"))
        .select(lit(id).as("rule_id"), expr(
          "stack(2, 'checked', n_checked, 'viol', n_violations) " +
            "as (kind, cnt)"))
    }.reduce(_.unionByName(_))

  /** q393's drain of [[docDomainCells]]: the q378 documents rows
    * (severity rejoined from the declared contract).
    */
  private[graft] def docDomainFromCells(cells: DataFrame): DataFrame = {
    def k(kind: String) =
      sum(when(col("kind") === kind, col("cnt")).otherwise(0L))
    val sev = domainRules.filter(_._2 == "documents")
      .map { case (id, _, s, _) => (id, s) }
    val sevCol = sev.foldLeft(lit(null).cast("string")) {
      case (acc, (id, s)) => when(col("rule_id") === id, s).otherwise(acc)
    }
    cells.groupBy(col("rule_id"))
      .agg(k("checked").as("n_checked"), k("viol").as("n_violations"))
      .select(col("rule_id"), lit("documents").as("tbl"),
        sevCol.as("severity"), col("n_checked"), col("n_violations"))
  }

  /** Contract gate (q380): the one row a CI job reads — rule counts
    * and violation counts by severity over all three audits (a null
    * anywhere and a dup on an error-grade key are error-grade).
    * PASS ⇔ zero error-grade violations; warn findings report but
    * never gate.
    */
  def contractGate(spark: SparkSession, dir: String): DataFrame =
    gateFrom(completeness(spark, dir), keyUniqueness(spark, dir),
      domainAudit(spark, dir))

  /** The gate rollup over the three audit tables — shared by the
    * batch gate and the q393 streaming twin, so the two can't drift.
    */
  private[graft] def gateFrom(completenessDf: DataFrame,
      keyDf: DataFrame, domainDf: DataFrame): DataFrame = {
    val nullCols = completenessDf
      .agg(count(lit(1)).as("n"),
        sum(when(col("n_nulls") > 0, 1L).otherwise(0L)).as("viol"))
      .select(col("n"), col("viol"), lit(0L).as("warnViol"))
    val keys = keyDf
      .agg(count(lit(1)).as("n"),
        sum(when(col("n_dup_keys") > 0 && col("severity") === "error",
          1L).otherwise(0L)).as("viol"),
        sum(when(col("n_dup_keys") > 0 && col("severity") === "warn",
          1L).otherwise(0L)).as("warnViol"))
    val rules = domainDf
      .agg(count(lit(1)).as("n"),
        sum(when(col("n_violations") > 0 && col("severity") === "error",
          1L).otherwise(0L)).as("viol"),
        sum(when(col("n_violations") > 0 && col("severity") === "warn",
          1L).otherwise(0L)).as("warnViol"))
    nullCols.unionByName(keys).unionByName(rules)
      .agg(sum(col("n")).as("n_rules"),
        sum(col("viol")).as("n_error_violations"),
        sum(col("warnViol")).as("n_warn_violations"))
      .select(col("n_rules"), col("n_error_violations"),
        col("n_warn_violations"),
        when(col("n_error_violations") === 0, "PASS").otherwise("FAIL")
          .as("gate"))
  }

  /** The three audit tables with the DOCUMENTS side supplied from
    * maintained state (the q393 streaming twin's drain): the nine
    * static tables' audits are recomputed (they don't stream — same
    * cost as the batch gate minus one corpus pass), the documents
    * rows come from the drained cells. `gateFrom` then yields the
    * q380 row, so q380's SQL is the oracle verbatim.
    */
  private[graft] def gateWithDocState(spark: SparkSession, dir: String,
      docCompleteness: DataFrame, docKeyRow: DataFrame,
      docDomain: DataFrame): DataFrame = {
    val staticTables = contractTables(spark, dir)
      .filter(_._1 != "documents")
    val comp = staticTables
      .map { case (t, df) => completenessCellsOf(t, df) }
      .reduce(_.unionByName(_))
      .unionByName(docCompleteness)
    val byName = staticTables.toMap
    val keys = declaredKeys.filter(_._1 != "documents")
      .map { case (t, ks, sev) =>
        keyRowOf(t, ks, sev,
          byName(t).groupBy(ks.map(col): _*)
            .agg(count(lit(1)).as("cnt")))
      }.reduce(_.unionByName(_))
      .unionByName(docKeyRow)
    val rules = domainRules.filter(_._2 != "documents")
      .map { case (id, t, sev, viol) =>
        byName(t).agg(count(lit(1)).as("n_checked"),
            sum(when(viol, 1L).otherwise(0L)).as("n_violations"))
          .select(lit(id).as("rule_id"), lit(t).as("tbl"),
            lit(sev).as("severity"), col("n_checked"),
            col("n_violations"))
      }.reduce(_.unionByName(_))
      .unionByName(docDomain)
    gateFrom(comp, keys, rules)
  }
}
