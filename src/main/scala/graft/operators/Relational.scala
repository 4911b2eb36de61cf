package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The general relational operator family (SURVEY.md §2.3, §2.4, §2.6,
  * §2.7 + the §7.2-step-8 extensions). All joins declared logically; the
  * small sides carry explicit `broadcast` hints so at 100 TB the fact
  * side never shuffles for a dimension lookup.
  */
object Relational {

  /** Exact decimal money: cast-before-aggregate makes sums identical
    * across engines (no FP accumulation-order drift) and keeps the
    * aggregation inside codegen.
    */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** J1 — semi join: customers that have at least one order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** J2 — anti join (insert-detection shape): customers with no
    * high-value order. The filter is applied to the build side before the
    * join, so only ~10% of orders participate.
    */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(
        Tables.orders(spark, dir)
          .filter(col("o_totalprice") > 450000.0)
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** J3 — broadcast enrichment join: fact rows decorated from three
    * dimension tables; dims broadcast so the orders scan never shuffles.
    */
  def enrichBroadcast(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"), "left")
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"), "left")
      .select(col("o_orderkey"), col("c_name"), col("n_name"), col("r_name"))
      .orderBy(col("o_orderkey"))

  /** Range (interval) join: errors attributed to the same user's
    * purchases within a 1-hour follow-up window — equi-key on user plus
    * a range predicate. Spark plans the equi-key as the shuffle key and
    * evaluates the interval as a post-join filter, so the cost is one
    * fact-fact shuffle; a skewed key would take the q59 salting
    * treatment. (Band/interval joins that lack ANY equi-key need
    * interval bucketing to avoid the cartesian; the user key makes that
    * unnecessary here.) Aggregated so the oracle stays small.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val err = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("e_id"), col("ts").as("e_ts"))
    purch.join(err, Seq("user_id"))
      .filter(col("e_ts") >= col("p_ts") &&
        col("e_ts") < col("p_ts") + expr("INTERVAL 1 HOUR"))
      .groupBy(col("user_id"))
      .agg(
        countDistinct(col("p_id")).as("n_purchases_with_errors"),
        countDistinct(col("e_id")).as("n_errors_after_purchase"),
        min(col("p_id")).as("first_purchase_id"))
      .orderBy(col("user_id"))
  }

  /** O1 — top-k with deterministic tiebreak (TakeOrderedAndProject —
    * per-partition top-k then a k-row merge on the driver; no full sort).
    */
  def topK(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("value").desc, col("event_id").asc)
      .limit(10)

  /** Unpivot (melt): wide per-user metrics stacked back to long form —
    * the inverse of q55's pivot, via the codegen'd `stack` generator
    * (no shuffle beyond the producing aggregation).
    */
  def unpivotUserMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        max(col("event_id")).as("max_id"))
      .select(col("user_id"),
        expr("stack(3, 'max_id', max_id, 'n_events', n_events, " +
          "'n_types', n_types) AS (metric, value)"))
      .orderBy(col("user_id"), col("metric"))

  /** U-family — relational set ops (EXCEPT/INTERSECT are DISTINCT-set
    * semantics in both Spark and ANSI SQL).
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchasers = ev
      .filter(col("event_type") === "purchase" && col("value") > 150.0)
      .select(col("user_id"))
    val errorers = ev
      .filter(col("event_type") === "error" && col("value") > 150.0)
      .select(col("user_id"))
    purchasers.except(errorers).orderBy(col("user_id"))
  }

  /** Windowed analytics: lag + running sum per key (extension step 8).
    * Running sum over exact decimals so the cumulative is reproducible.
    */
  def windowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(spark, dir)
      .select(
        col("user_id"), col("event_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        sum(dec(col("value")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** ROLLUP with GROUPING() disambiguation (extension step 8). */
  def rollupOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_priority"))
      .orderBy(col("g_status"), col("g_priority"),
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Pivot: per-user event counts spread into one column per type
    * (explicit value list keeps the schema deterministic).
    */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))

  /** Explode/lateral: token frequencies across the corpus, top-20. */
  def explodeTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(graft.functions.TextAnalytics.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(20)

  /** Exact percentiles (linear interpolation over the sorted set) —
    * identical arithmetic in both engines, unlike the FP-accumulation
    * aggregates.
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"))
      .orderBy(col("event_type"))

  /** Exact tolerance envelope for the approx-percentile invariant test:
    * the sketch's p50/p90 must land between the exact p45–p55 / p85–p95
    * values (a rank-error bound, which is what the summary guarantees).
    */
  def percentilesEnvelope(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.45)").as("p45"),
        expr("percentile(value, 0.55)").as("p55"),
        expr("percentile(value, 0.85)").as("p85"),
        expr("percentile(value, 0.95)").as("p95"))
      .orderBy(col("event_type"))

  /** Approximate percentiles via Spark's built-in sketch aggregate
    * (`approx_percentile`, a mergeable quantile summary): the 100 TB
    * path beside [[percentiles]] — exact percentile sorts every group's
    * values; the sketch is a bounded-size state merged map-side, so the
    * shuffle payload per group is O(accuracy), not O(rows). Sketch-only
    * shape; the registered q81 is the oracled audit twin
    * [[approxPercentiles]].
    */
  def approxPercentilesRaw(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("approx_percentile(value, 0.5, 10000)").as("p50_approx"),
        expr("approx_percentile(value, 0.9, 10000)").as("p90_approx"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Oracled audit form of the percentile sketch (q81): runs the
    * sketch AND the exact percentiles in one aggregation and emits the
    * exact values plus `approx_ok` — whether each sketch quantile lands
    * inside the exact p45–p55 / p85–p95 rank-error envelope (the bound
    * the mergeable summary actually guarantees). The sketch output
    * itself is implementation-defined so no SQL engine can reproduce
    * it, but the ENVELOPE CHECK is portable: DuckDB computes the same
    * exacts and expects ok = 1, which hash-pins the sketch in-tolerance
    * cross-engine instead of settling for a rows-only check. The
    * sketch-only production path (no exact co-compute) stays available
    * as [[approxPercentilesRaw]].
    */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("approx_percentile(value, 0.5, 10000)").as("p50a"),
        expr("approx_percentile(value, 0.9, 10000)").as("p90a"),
        expr("percentile(value, 0.45)").as("p45"),
        expr("percentile(value, 0.5)").as("p50_exact"),
        expr("percentile(value, 0.55)").as("p55"),
        expr("percentile(value, 0.85)").as("p85"),
        expr("percentile(value, 0.9)").as("p90_exact"),
        expr("percentile(value, 0.95)").as("p95"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("n"), col("p50_exact"),
        col("p90_exact"),
        when(col("p50a").between(col("p45"), col("p55")) &&
          col("p90a").between(col("p85"), col("p95")), 1L)
          .otherwise(0L).as("approx_ok"))
      .orderBy(col("event_type"))

  /** Exact moments: mean and population variance computed from decimal
    * sums (sum, sum-of-squares) so partitioned accumulation cannot
    * drift — the portable form of stddev/variance at scale.
    */
  def exactStats(spark: SparkSession, dir: String): DataFrame = {
    val v = col("value").cast("decimal(9,2)")
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(v).as("s1"),
        sum(v * v).as("s2"))
      .select(
        col("event_type"), col("n"),
        (col("s1").cast("double") / col("n").cast("double")).as("mean"),
        ((col("s2").cast("double") - col("s1").cast("double") *
          col("s1").cast("double") / col("n").cast("double")) /
          col("n").cast("double")).as("variance"))
      .orderBy(col("event_type"))
  }

  /** Skew-resistant salted join: the build side is replicated across 8
    * salt values so a hot key spreads over 8 reducers; result is
    * identical to the plain join, which is what the oracle checks.
    */
  def saltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val salts = 8
    val ev = Tables.events(spark, dir)
      .withColumn("salt", pmod(col("event_id"), lit(salts)))
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .crossJoin(spark.range(salts).select(col("id").cast("int").as("salt")))
    ev.join(dim,
        ev("user_id") === dim("c_custkey") && ev("salt") === dim("salt"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy(col("c_mktsegment").asc_nulls_first)
  }

  /** Top-k per group via ranked window (the scalable "greatest-n-per-
    * group" shape — no self-join).
    */
  def topKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    Tables.documents(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("lang"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("rk"))
  }

  /** Ranking-function family over a total order (deterministic:
    * event_id tie-break makes every rank reproducible).
    */
  def rankingFunctions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(
        col("event_type"), col("event_id"), col("value"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        first_value(col("event_id")).over(w).as("first_id"))
      .orderBy(col("event_type"), col("event_id"))
  }

  /** CUBE over (event_type, day) with GROUPING() markers. */
  def cubeEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("day", to_date(col("ts")).cast("string"))
      .cube(col("event_type"), col("day"))
      .agg(
        count(lit(1)).as("n"),
        grouping(col("event_type")).cast("long").as("g_type"),
        grouping(col("day")).cast("long").as("g_day"))
      .orderBy(col("g_type"), col("g_day"),
        col("event_type").asc_nulls_first, col("day").asc_nulls_first)

  /** Exact distinct counts per group (the oracle-checked twin of the
    * approx sketch variant).
    */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** HLL-sketch distinct counts — at 100 TB this replaces the exact
    * distinct's full shuffle with a fixed-size sketch merge. Sketch-
    * only shape; the registered q47 is the oracled audit twin
    * [[approxDistinctCounts]].
    */
  def approxDistinctRaw(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** Oracled audit form of the HLL sketch (q47): one aggregation
    * computes the sketch AND the exact distinct, emitting the exact
    * count plus `approx_ok` = |approx − exact| ≤ 15% · exact (rsd is
    * 0.02, so 15% is a ≥7σ bound — the same envelope the invariant
    * spec asserts). HLL output is hash-seeded and engine-specific, but
    * the tolerance verdict is portable: DuckDB computes the exact count
    * and expects ok = 1, hash-pinning the sketch in-tolerance
    * cross-engine. Sketch-only production path: [[approxDistinctRaw]].
    */
  def approxDistinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users_exact"),
        approx_count_distinct(col("user_id"), 0.02).as("au"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("n_events"), col("n_users_exact"),
        when(abs(col("au").cast("double") -
            col("n_users_exact").cast("double")) <=
          lit(0.15) * col("n_users_exact").cast("double"), 1L)
          .otherwise(0L).as("approx_ok"))
      .orderBy(col("event_type"))

  /** A4 collapse — per-key ordered-distinct sequence: first occurrence of
    * each event_type per user, concatenated in event order. The window
    * form proves the reference's sequential fold is expressible
    * relationally (SURVEY.md §7.3-1).
    */
  def orderedFoldDistinct(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("user_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("event_id"), col("event_type")))),
            s => s.getField("event_type")),
          ",").as("type_seq"),
        count(lit(1)).as("n_distinct_types"))
      .orderBy(col("user_id"))
  }
}
