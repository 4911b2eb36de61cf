package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** User-lifecycle analytics over the events table — the cohort /
  * growth-accounting / RFM / stickiness decision tables a 24/7
  * product ingest reads next to the behavioral views (q198/q144/q260):
  * WHO keeps coming back, not just what they do while here. The
  * reference's contact-point service keeps per-contact recency state
  * (`src/services/saveToPostgres.js` upsert timestamps); these are the
  * corpus-wide rollups of that per-key state.
  *
  * Everything is built on ONE shared grain — the distinct
  * (user_id, day) activity table that q166's retention triangle
  * already aggregates — so the three new batch reports ride the same
  * first collapse, and the streaming twin (q276) only has to maintain
  * that grain (distinct-merge, order-insensitive) to drain the whole
  * family exactly.
  *
  * Day numbers here are exact integer epoch-day
  * (`unix_micros div 86.4e9`) in BOTH engines — no date formatting,
  * no timezone arithmetic (q166 keeps its calendar-date form; under
  * the UTC session the two grains are the same partition of events).
  */
object Lifecycle {

  private val usPerDay = 86400000000L

  /** The shared grain: distinct (user_id, day) activity pairs.
    * 100 TB shape: one map-side-combined distinct collapses events to
    * ≤ users × active-days rows; every report below aggregates THIS,
    * never the raw events, and the streaming twin's state is exactly
    * this table (distinct-merge = idempotent, order-insensitive).
    */
  private[graft] def userDays(ev: DataFrame): DataFrame =
    ev.select(col("user_id"),
        expr(s"unix_micros(cast(ts as timestamp)) div $usPerDay")
          .as("day"))
      .distinct()

  /** Growth accounting (q273): per active day, the classic
    * new / retained / resurrected split of active users plus the
    * churn-in count (users whose previous active day was yesterday but
    * who are gone today) — the four numbers behind every "is this
    * corpus/product actually growing" chart. Definitions on the
    * (user, day) grain: `new` = first active day; `retained` =
    * previous active day was exactly day−1; `resurrected` = a gap of
    * ≥ 2 days; `n_churned` on day d = users active on d−1 whose next
    * activity is not d. The report grid is the observed active days
    * (churn past the last observed day is unknowable and not emitted).
    *
    * 100 TB shape: ONE user-partitioned window sort over the
    * (user, day) grain serves both lag (classification) and lead
    * (churn); both rollups are map-side-combined onto #days rows, then
    * a days-bounded hash join stitches them.
    */
  def growthAccounting(spark: SparkSession, dir: String): DataFrame =
    growthOf(userDays(Tables.events(spark, dir)))

  /** The q273 finish off the (user, day) grain — shared by the batch
    * report and q300's streaming drain.
    */
  private[graft] def growthOf(udRaw: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val ud = udRaw
      .withColumn("prev_day", lag(col("day"), 1).over(byUser))
      .withColumn("next_day", lead(col("day"), 1).over(byUser))
    val active = ud.groupBy(col("day")).agg(
      count(lit(1)).as("n_active"),
      sum(when(col("prev_day").isNull, 1L).otherwise(0L)).as("n_new"),
      sum(when(col("prev_day") === col("day") - 1L, 1L).otherwise(0L))
        .as("n_retained"),
      sum(when(col("prev_day").isNotNull &&
        col("prev_day") < col("day") - 1L, 1L).otherwise(0L))
        .as("n_resurrected"))
    val churned = ud
      .filter(col("next_day").isNull || col("next_day") > col("day") + 1L)
      .select((col("day") + 1L).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("churn"))
    active.join(churned, Seq("day"), "left")
      .withColumn("n_churned", coalesce(col("churn"), lit(0L)))
      .select(col("day"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_resurrected"), col("n_churned"))
      .orderBy(col("day"))
  }

  /** RFM segmentation (q274): every user scored on Recency (days since
    * last activity, vs the corpus max day), Frequency (event count)
    * and Monetary (exact cent sum of `value`), then binned into log2
    * cells by the q260 bit-length bucket rule — the marketing-standard
    * user-value segmentation, made hash-exact by keeping money in
    * integer cents (the `decimal(18,2)` discipline q20's session_value
    * uses) and buckets in exact longs.
    *
    * 100 TB shape: one map-side-combined user-grain aggregate over the
    * event scan, a broadcast of the single corpus-max-day row, then a
    * second aggregate onto ≤ ~40³ bucket cells. No sort, no ntile —
    * a global quantile rank would be a full sort at user grain; fixed
    * log2 cells are the scale-safe segmentation.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame =
    rfmReport(rfmStatsOf(Tables.events(spark, dir)))

  /** Per-user (last_day, n_events, cents) — the mergeable sufficient
    * statistic for the RFM report (max / sum / sum), so q279's
    * streaming twin keeps exactly this table as ledger state.
    */
  private[graft] def rfmStatsOf(ev: DataFrame): DataFrame =
    ev.select(col("user_id"),
        expr(s"unix_micros(cast(ts as timestamp)) div $usPerDay")
          .as("day"),
        col("value"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(max(col("day")).as("last_day"),
        count(lit(1)).as("n_events"),
        (sum(col("value").cast("decimal(18,2)")) * 100)
          .cast("long").as("cents"),
        // purchase flag rides the same fold (max-merges) so the rfm
        // state also drains q339/q344's conversion table
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))

  /** The q274 finish arithmetic over a per-user stats table — shared
    * by the batch report and q279's streaming drain.
    */
  /** The q260/q274 bit-length bucket rule. */
  private[graft] def log2Bucket(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    when(c <= 1L, lit(0L)).otherwise(length(bin(c)).cast("long") - 1L)

  private[graft] def rfmReport(perUser: DataFrame): DataFrame = {
    val maxDay = perUser.agg(max(col("last_day")).as("corpus_max_day"))
    def bucket(c: org.apache.spark.sql.Column) = log2Bucket(c)
    perUser.crossJoin(broadcast(maxDay))
      .withColumn("recency", col("corpus_max_day") - col("last_day"))
      .withColumn("r_bucket", bucket(col("recency")))
      .withColumn("f_bucket", bucket(col("n_events")))
      .withColumn("m_bucket", bucket(col("cents")))
      .groupBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_events")).as("n_events"),
        sum(col("cents")).as("sum_cents"),
        min(col("recency")).as("min_recency"),
        max(col("recency")).as("max_recency"))
      .orderBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
  }

  /** DAU/WAU stickiness (q275): per observed day, the exact count of
    * distinct users active that day (DAU) and in the trailing 7-day
    * window (WAU), plus their ratio — the engagement-depth series
    * every growth dashboard pairs with q273's flows. Exact rolling
    * distinct without rescanning: each (user, day) activity pair
    * contributes itself to the 7 report days it can be visible in
    * (a static 7× expansion of the DAY grain, not the event grain),
    * then one distinct+count per report day.
    *
    * 100 TB shape: events collapse to (user, day) once; the sequence
    * explode is a 7× fan-out of that already-collapsed grain; the
    * report grid (distinct observed days) broadcasts into a semi join.
    * No correlated rescan, no window over users.
    */
  /** Cohort LTV curve (q280): per (cohort_day, age), the exact cent
    * revenue the cohort generated at that age, the cumulative revenue
    * through that age, and cumulative LTV per acquired user — the
    * money view of q166's retention triangle (retention says who came
    * back; this says what coming back was worth). Cents all the way
    * (the q274 discipline); the per-user division is the only double.
    *
    * 100 TB shape: events collapse once to (user, day, cents) —
    * map-side combined — then a user-partitioned window min assigns
    * cohorts (no self-join) and everything after runs on ≤ #days²
    * rows, where the cumulative window is cheap.
    */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame =
    ltvOf(userDayCentsOf(Tables.events(spark, dir)))

  /** The (user, day, cents) grain — q280's mergeable sufficient
    * statistic (cents sum-merge per (user, day)), kept as ledger state
    * by q284's streaming twin.
    */
  private[graft] def userDayCentsOf(ev: DataFrame): DataFrame =
    ev.select(col("user_id"),
        expr(s"unix_micros(cast(ts as timestamp)) div $usPerDay")
          .as("day"),
        col("value"))
      .groupBy(col("user_id"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100)
        .cast("long").as("cents"))

  /** The q280 finish arithmetic over a (user, day, cents) grain —
    * shared by the batch curve and q284's streaming drain.
    */
  private[graft] def ltvOf(udc: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val byCohort = Window.partitionBy(col("cohort_day"))
      .orderBy(col("age"))
    udc
      .withColumn("cohort_day", min(col("day")).over(byUser))
      .withColumn("age", col("day") - col("cohort_day"))
      .groupBy(col("cohort_day"), col("age"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("cents")).as("cents"))
      .withColumn("cohort_size",
        first(col("n_users")).over(byCohort))
      .withColumn("cum_cents",
        sum(col("cents")).over(
          byCohort.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      .withColumn("ltv_cents_per_user",
        col("cum_cents").cast("double") / col("cohort_size").cast("double"))
      .select(col("cohort_day"), col("age"), col("n_users"),
        col("cents"), col("cohort_size"), col("cum_cents"),
        col("ltv_cents_per_user"))
      .orderBy(col("cohort_day"), col("age"))
  }

  /** Seasonal baseline + residual anomaly (q281): per (event_type,
    * day), the observed daily count against that type's day-of-week
    * baseline (mean/stddev over all observed days sharing the
    * weekday), with the z-score and a |z| > 2 flag — the
    * weekday-aware upgrade of q143's trailing-window anomaly (a
    * Saturday dip is only anomalous vs other Saturdays). Day-of-week
    * is exact integer arithmetic — `(epoch_day + 4) % 7`, 0 = Sunday
    * (1970-01-01 was a Thursday) — identical in both engines, no
    * calendar functions. Variance is the population form from exact
    * integer sums (Σn, Σn²); the baseline includes the day itself
    * (a pure lookup table, not a leave-one-out test).
    *
    * 100 TB shape: events collapse once to (type, day) counts —
    * map-side combined; the baseline is a second aggregate onto
    * #types × 7 rows broadcast back over the daily grid. Both windows
    * of q143's discipline, neither over the event stream.
    */
  def seasonalBaseline(spark: SparkSession, dir: String): DataFrame =
    seasonalOf(dailyCountsOf(Tables.events(spark, dir)))

  /** The shared anomaly grain: (event_type, exact epoch-day, count).
    * Sufficient statistic for BOTH q281's weekday baseline and q292's
    * CUSUM — and it sum-merges (per (type, day)), so ONE maintained
    * streaming state drains both reports (q296/q297).
    */
  private[graft] def dailyCountsOf(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"),
        expr(s"unix_micros(cast(ts as timestamp)) div $usPerDay")
          .as("day"))
      .agg(count(lit(1)).as("n"))

  /** The q281 finish off the daily-count grain — shared by the batch
    * report and q297's streaming drain.
    */
  private[graft] def seasonalOf(dailyRaw: DataFrame): DataFrame = {
    val daily = dailyRaw
      .withColumn("dow", (col("day") + 4L) % 7L)
    val base = daily.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("ss"))
      .withColumn("mean", col("s").cast("double") / col("n_days").cast("double"))
      .withColumn("variance",
        (col("ss").cast("double") -
          col("s").cast("double") * col("s").cast("double") /
            col("n_days").cast("double")) / col("n_days").cast("double"))
      .select(col("event_type"), col("dow"), col("n_days"),
        col("mean"), col("variance"))
    daily.join(broadcast(base), Seq("event_type", "dow"))
      .withColumn("z",
        when(col("variance") <= 0.0, lit(0.0))
          .otherwise((col("n").cast("double") - col("mean")) /
            sqrt(col("variance"))))
      .withColumn("is_anomaly",
        when(abs(col("z")) > 2.0, 1L).otherwise(0L))
      .select(col("event_type"), col("day"), col("dow"), col("n"),
        col("n_days"), col("mean"), col("z"), col("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  def dauWauStickiness(spark: SparkSession, dir: String): DataFrame =
    stickinessOf(userDays(Tables.events(spark, dir)))

  /** The q275 finish off the (user, day) grain — shared by the batch
    * report and q301's streaming drain.
    */
  private[graft] def stickinessOf(ud: DataFrame): DataFrame = {
    val days = ud.select(col("day")).distinct()
    val dau = ud.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6L)).as("day"))
      .join(broadcast(days), Seq("day"), "left_semi")
      .distinct()
      .groupBy(col("day"))
      .agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .withColumn("stickiness",
        col("dau").cast("double") / col("wau").cast("double"))
      .select(col("day"), col("dau"), col("wau"), col("stickiness"))
      .orderBy(col("day"))
  }

  /** Survival / hazard table (q291): per observed tenure t (days
    * between a user's first and last active day), the classic
    * Kaplan-Meier triple — users still at risk at t (tenure ≥ t),
    * users whose observed life ENDED at t, and users censored at t
    * (their last day is the corpus max day, so "still alive") — plus
    * the discrete hazard n_churned / n_at_risk. Everything is exact
    * integers from the (user, first, last) grain; the single division
    * is the hazard itself.
    *
    * 100 TB shape: userDays collapses to user grain (one map-side
    * combine), the corpus max day is a broadcast scalar, and the
    * at-risk suffix sum runs over TENURE grain (≤ #days rows — a
    * bounded single-partition cumulative, the same day-grain
    * discipline as q273's stitch).
    */
  def survivalHazard(spark: SparkSession, dir: String): DataFrame =
    survivalOf(spansOf(Tables.events(spark, dir)))

  /** The survival grain: per-user (first_day, last_day) — min/max-
    * merges (idempotent AND order-insensitive), so q295's streaming
    * state is exactly this table.
    */
  private[graft] def spansOf(ev: DataFrame): DataFrame =
    userDays(ev).groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day"))

  /** The q291 finish off the spans grain — shared by the batch report
    * and q295's streaming drain.
    */
  private[graft] def survivalOf(spans: DataFrame): DataFrame = {
    val maxDay = spans.agg(max(col("last_day")).as("m"))
    val byTenure = spans.crossJoin(broadcast(maxDay))
      .select((col("last_day") - col("first_day")).as("tenure"),
        (col("last_day") === col("m")).cast("long").as("censored"))
      .groupBy(col("tenure"))
      .agg(count(lit(1)).as("n_total"),
        sum(col("censored")).as("n_censored"))
    val atRisk = Window.orderBy(col("tenure").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byTenure
      .withColumn("n_at_risk", sum(col("n_total")).over(atRisk))
      .withColumn("n_churned", col("n_total") - col("n_censored"))
      .select(col("tenure"), col("n_at_risk"), col("n_churned"),
        col("n_censored"),
        (col("n_churned").cast("double") /
          col("n_at_risk").cast("double")).as("hazard"))
      .orderBy(col("tenure"))
  }

  /** Conversion by RFM segment (q339): the q274 cells scored on
    * whether their users ever purchase — which recency/frequency/
    * monetary segments actually convert, the targeting table a
    * marketing run reads next to q274's population counts. Exact:
    * converter = user with ≥ 1 purchase event (a distinct flag), the
    * rate is one division per cell.
    *
    * 100 TB shape: rides q274's user-grain stats plus one distinct
    * purchase-user flag (map-side combined), one user-grain left
    * join, then the bucket rollup onto ≤ ~40³ cells.
    */
  def segmentConversion(spark: SparkSession, dir: String): DataFrame =
    conversionFromStats(rfmStatsOf(Tables.events(spark, dir)))

  /** The q339 finish off the per-user rfm stats (which carry the
    * max-merged purchase flag) — shared by the batch table and
    * q344's streaming drain.
    */
  private[graft] def conversionFromStats(stats: DataFrame): DataFrame = {
    val maxDay = stats.agg(max(col("last_day")).as("corpus_max_day"))
    stats
      .crossJoin(broadcast(maxDay))
      .withColumn("r_bucket",
        log2Bucket(col("corpus_max_day") - col("last_day")))
      .withColumn("f_bucket", log2Bucket(col("n_events")))
      .withColumn("m_bucket", log2Bucket(col("cents")))
      .groupBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("converted")).as("n_converters"))
      .select(col("r_bucket"), col("f_bucket"), col("m_bucket"),
        col("n_users"), col("n_converters"),
        (col("n_converters").cast("double") /
          col("n_users").cast("double")).as("conversion_rate"))
      .orderBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
  }

  /** Daily OHLC candlesticks (q328): per (event_type, day) — the
    * first/last event's value (open/close, selected by the total
    * (ts, event_id) order), the day's high/low, exact decimal volume
    * and event count. The standard time-series rollup for a metric
    * stream; every field is a SELECTION or an exact decimal sum, so
    * the table hash-matches without any FP-accumulation concern.
    *
    * 100 TB shape: one map-side-combined aggregate onto #types×#days
    * cells — open/close ride struct min/max (argmin/argmax without a
    * sort), which also makes the statistic MERGEABLE: q329 maintains
    * exactly this table per micro-batch.
    */
  def ohlcDaily(spark: SparkSession, dir: String): DataFrame =
    ohlcFinish(ohlcStatOf(Tables.events(spark, dir)))

  private[graft] def ohlcStatOf(ev: DataFrame): DataFrame =
    ev.select(col("event_type"),
        expr(s"unix_micros(cast(ts as timestamp)) div $usPerDay")
          .as("day"),
        col("ts"), col("event_id"), col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        sum(col("value").cast("decimal(18,2)")).as("vol"),
        count(lit(1)).as("n"))

  private[graft] def ohlcMerge(rows: DataFrame): DataFrame =
    rows.groupBy(col("event_type"), col("day"))
      .agg(min(col("o")).as("o"), max(col("c")).as("c"),
        max(col("high")).as("high"), min(col("low")).as("low"),
        sum(col("vol")).as("vol"), sum(col("n")).as("n"))

  private[graft] def ohlcFinish(sums: DataFrame): DataFrame =
    sums.select(col("event_type"), col("day"), col("n").as("n_events"),
        col("o").getField("value").as("open"),
        col("high"), col("low"),
        col("c").getField("value").as("close"),
        col("vol").cast("double").as("volume"))
      .orderBy(col("event_type"), col("day"))

  /** CUSUM level-shift detector (q292): per event type, the one-sided
    * cumulative-sum statistic over the DENSE daily-count series
    * (missing days count 0 — a detector that skips quiet days would
    * never see an outage). Kept exact by clearing denominators: with
    * per-type total T over D days, y_d = D·n_d − T (long) and the
    * CUSUM recursion S_d = max(0, S_{d−1} + y_d) has the closed form
    * S_d = P_d − min(0, min_{j≤d} P_j) over the prefix sums P — two
    * window folds, all BIGINT. `cusum` = S_d/D (mean-units, the one
    * division) and the flag fires at S_d > 3T (three mean-days of
    * excess). The sequential complement of q281's per-weekday z and
    * q143's trailing window: CUSUM accumulates persistent small
    * shifts those point tests miss.
    *
    * 100 TB shape: events collapse to (type, day) counts map-side;
    * the dense grid is #types × #days rows; both window folds
    * partition by type and run over day grain.
    */
  def cusumShift(spark: SparkSession, dir: String): DataFrame =
    cusumOf(dailyCountsOf(Tables.events(spark, dir)))

  /** The q292 finish off the daily-count grain — shared by the batch
    * report and q296's streaming drain.
    */
  private[graft] def cusumOf(daily: DataFrame): DataFrame = {
    val bounds = daily.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val grid = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"))).as("day"))
    val full = grid.join(daily, Seq("event_type", "day"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val totals = full.groupBy(col("event_type"))
      .agg(sum(col("n")).as("total"), count(lit(1)).as("n_days"))
    val run = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full.join(broadcast(totals), Seq("event_type"))
      .withColumn("y", col("n_days") * col("n") - col("total"))
      .withColumn("p", sum(col("y")).over(run))
      .withColumn("s", col("p") - least(lit(0L), min(col("p")).over(run)))
      .select(col("event_type"), col("day"), col("n"),
        col("s").as("cusum_scaled"),
        (col("s").cast("double") / col("n_days").cast("double"))
          .as("cusum"),
        (col("s") > lit(3L) * col("total")).cast("long").as("is_shift"))
      .orderBy(col("event_type"), col("day"))
  }
}
