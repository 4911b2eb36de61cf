package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Gap-based sessionization — the batch analogue of the reference's
  * cron-driven micro-batching (SURVEY.md §2.11): lag + cumulative sum,
  * two windows over the same (user_id, ts) partitioning so Spark reuses
  * one sort/exchange for both.
  */
object Sessionize {

  /** Sessions = runs of events per user with < 30 min between
    * consecutive events. Emits one row per session with exact counts.
    */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event_id"),
        max(col("event_id")).as("last_event_id"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** SCD2 dimension history (q201): the slowly-changing-dimension
    * type-2 build the reference's upsert family (K1–K8) stops short
    * of — instead of overwriting a key's current value, every CHANGE
    * of a user's tracked attribute (event_type here stands in for the
    * dimension attribute) opens a new version row with
    * [valid_from, valid_to) bounds and an is_current flag. Change
    * detection is a lag-compare, versioning a row_number, closing a
    * lead — all over ONE window sort; the result is the standard
    * point-in-time-joinable history table ([[AsOf]] queries then
    * resolve "value as of t" against it).
    *
    * 100 TB shape: one (user)-partitioned window sort over the event
    * scan (the q20 sort, reused); output is change-bounded, not
    * event-bounded. Timestamps render via a fixed strftime so the
    * history is hash-exact cross-engine.
    */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("version", row_number().over(byUser).cast("long"))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(byUser))
      .select(col("user_id"), col("version"),
        col("event_type").as("attr"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss")
          .as("valid_to"),
        when(col("valid_to_ts").isNull, 1L).otherwise(0L).as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  /** Point-in-time resolution against the SCD2 history (q202): for a
    * probe set of events, the attribute value that was CURRENT at each
    * event's timestamp — the interval join every SCD2 table exists to
    * serve (the complement of [[AsOf]]'s order-based as-of: here
    * validity is an explicit [valid_from, valid_to) range). Probe =
    * every 100th event; the resolved attr must equal that event's own
    * type when the probe hits a change point, and the in-force version
    * otherwise.
    *
    * 100 TB shape: the join keys on user_id EQUALITY (shuffle/broadcast
    * on the user key — the selective predicate), with the interval
    * containment as a residual per-user filter over that user's
    * version chain (versions per user ≪ events per user). No
    * cross-user work anywhere.
    */
  def scd2Resolve(spark: SparkSession, dir: String,
      probeMod: Int = 100): DataFrame = {
    val hist = scd2History(spark, dir)
      .select(col("user_id"), col("version"), col("attr"),
        col("valid_from"), col("valid_to"))
    val probes = Tables.events(spark, dir)
      .filter(col("event_id") % probeMod === 0)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("at"))
    probes.join(hist, Seq("user_id"))
      .filter(col("at") >= col("valid_from") &&
        (col("valid_to").isNull || col("at") < col("valid_to")))
      .select(col("event_id"), col("user_id"), col("at"),
        col("version"), col("attr"))
      .orderBy(col("event_id"))
  }

  /** Session transition matrix (q198): counts and row-normalized
    * probabilities of CONSECUTIVE event-type pairs inside the same
    * session (q20's 30-minute sessionization) — the first-order Markov
    * view of user behavior that q144's fixed funnel special-cases (a
    * funnel is one path through this matrix; the matrix shows every
    * path and its mass). Diagonal mass is repetition; heavy off-
    * diagonal cells are the de-facto flows.
    *
    * 100 TB shape: the q20 sessionization sort is reused as-is, the
    * lag is another frame over the SAME window sort (no extra
    * exchange), and the rollup is a map-side-combined aggregate on a
    * (types × types)-bounded key space.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame =
    transitionMatrix(spark, dir).orderBy(col("from_type"), col("to_type"))

  /** The un-ordered q198 matrix — shared by q198's report and q266's
    * per-row entropy rollup.
    */
  private def transitionMatrix(spark: SparkSession, dir: String): DataFrame =
    transitionProbs(transitionPairs(
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("is_state", lit(0)))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n")))

  /** Per-event (from_type, to_type) transition pairs. A pair counts
    * iff its events are CONSECUTIVE for the user and ≤ 30 min apart —
    * exactly q198's same-session-consecutive rule (a session boundary
    * is by definition a > 30 min gap, so "same session" for a
    * consecutive pair ⇔ gap ≤ 30 min; no session ids needed). That
    * single-lag form is what lets q269's streaming twin re-enter the
    * last event per USER as a synthetic anchor (`is_state` rows anchor
    * the lag but never count) and score cross-batch transitions with
    * the same rule.
    */
  private[graft] def transitionPairs(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    ev.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("from_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("is_state") === 0 && col("from_type").isNotNull &&
        col("ts") <= col("prev_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("from_type"), col("event_type").as("to_type"))
  }

  /** Counts → row-normalized probabilities (over ≤ #types² rows) —
    * shared by the batch matrix and q269's streaming drain.
    */
  private[graft] def transitionProbs(counts: DataFrame): DataFrame =
    counts.withColumn("p", col("n").cast("double") /
      sum(col("n")).over(Window.partitionBy(col("from_type")))
        .cast("double"))

  /** Session path trigrams (q268): every ordered 3-step event-type
    * path inside a session, counted and ranked — the second-order
    * extension of q198's matrix (q144's funnel is ONE row of this
    * table; this surfaces every 3-step flow and its mass, the "what do
    * users actually do" report behind funnel design). Rank is a total
    * order (n desc, then path) so the table hash-matches; the full
    * path space is ≤ #types³ rows — no LIMIT needed.
    *
    * 100 TB shape: the two lags are extra frames over q20's one
    * sessionization sort (no new exchange); the rollup is map-side
    * combined onto a ≤ types³ key space; the rank window runs on those
    * bounded rows.
    */
  def eventPathTrigrams(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val bySess = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("from1", lag(col("event_type"), 1).over(bySess))
      .withColumn("from2", lag(col("event_type"), 2).over(bySess))
      .filter(col("from2").isNotNull)
      .groupBy(col("from2"), col("from1"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(Window.orderBy(
        col("n").desc, col("from2"), col("from1"), col("to_type")))
        .cast("long"))
      .select(col("rank"), col("from2"), col("from1"), col("to_type"),
        col("n"))
      .orderBy(col("rank"))
  }

  /** Session-size histogram (q271): log2 histogram of events-per-
    * session (the q260 bit-length bucket rule over q20's sessions) —
    * the distribution that SIZES per-session state (a mapGroupsWithState
    * buffer, a funnel's per-session scan) and exposes the heavy-tail
    * sessions that skew it. All columns exact longs.
    *
    * 100 TB shape: rides q20's sessionization sort; sessions collapse
    * to ≤ ~40 bucket rows by one map-side-combined aggregate.
    */
  def sessionSizeHistogram(spark: SparkSession, dir: String): DataFrame =
    sizeHistogramOf(sessions(spark, dir))

  /** The q271 bucket rollup over any (n_events)-carrying session
    * grain — shared by the batch histogram and q283's streaming drain
    * (per-session event counts sum-merge, so the session grain is the
    * mergeable sufficient statistic).
    */
  private[graft] def sizeHistogramOf(sess: DataFrame): DataFrame =
    sess
      .withColumn("bucket",
        when(col("n_events") <= 1L, lit(0L))
          .otherwise(length(bin(col("n_events"))).cast("long") - 1L))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        min(col("n_events")).as("min_events"),
        max(col("n_events")).as("max_events"))
      .orderBy(col("bucket"))

  /** Transition entropy (q266): per from-type, the Shannon entropy and
    * perplexity of the next-event-type distribution — the one-number
    * summary of q198's matrix that says how PREDICTABLE behavior is
    * after each event kind (perplexity ≈ effective branching factor; a
    * from-type whose perplexity ≈ 1 is a deterministic flow worth
    * special-casing in q144's funnel, one near #types is noise). The
    * q173 corpus-entropy discipline applied to the behavioral Markov
    * view: p's are exact-count ratios, the entropy sum runs over a
    * ≤ #types-sized distribution, and the checker's 9-decimal rounding
    * absorbs fold-order drift exactly as it does for q173/q158.
    *
    * 100 TB shape: rides q198's single sessionization sort; the rollup
    * collapses (types × types) rows to #types — driver-scale. No new
    * corpus pass.
    */
  def transitionEntropy(spark: SparkSession, dir: String): DataFrame =
    transitionMatrix(spark, dir)
      .groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_total"),
        count(lit(1)).as("n_dest"),
        max(col("p")).as("top_p"),
        (-sum(col("p") * log(col("p")))).as("entropy"))
      .withColumn("perplexity", exp(col("entropy")))
      .orderBy(col("from_type"))

  /** Session conversion funnel (q144): per-session ORDERED stage
    * progression view → click → purchase (each stage must occur
    * strictly after the previous one within the same session), plus
    * global session/stage counts — the product-analytics companion to
    * [[sessions]], and the event-stream analogue of q141's corpus
    * funnel.
    *
    * Stage anchors are `min(event_id)` — the fixtures' event ids are
    * strictly time-ordered (asserted by test), which makes every
    * anchor and comparison exact BIGINT arithmetic cross-engine.
    *
    * 100 TB shape: one sessionization window (same sort q20 reuses),
    * then three conditional per-session aggregates off the sessioned
    * scan with broadcast-joined stage anchors; output is four
    * aggregate rows.
    */
  def sessionFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = sessionedEvents(spark, dir)
      .select(col("user_id"), col("session_id"), col("event_type"),
        col("event_id"))
    val keys = Seq("user_id", "session_id")
    val tv = ev.filter(col("event_type") === "view")
      .groupBy(keys.map(col): _*).agg(min(col("event_id")).as("tv"))
    val tc = ev.filter(col("event_type") === "click")
      .join(tv, keys).filter(col("event_id") > col("tv"))
      .groupBy(keys.map(col): _*).agg(min(col("event_id")).as("tc"))
    val tp = ev.filter(col("event_type") === "purchase")
      .join(tc, keys).filter(col("event_id") > col("tc"))
      .groupBy(keys.map(col): _*).agg(min(col("event_id")).as("tp"))
    def cnt(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as("n_sessions"))
        .select(lit(name).as("stage"), col("n_sessions"))
    cnt(ev.select(keys.map(col): _*).distinct(), "s0_sessions")
      .unionByName(cnt(tv, "s1_view"))
      .unionByName(cnt(tc, "s2_view_click"))
      .unionByName(cnt(tp, "s3_view_click_purchase"))
      .orderBy(col("stage"))
  }

  /** The q20 sessionization frame — (user_id, session_id, event_type,
    * event_id, ts, value) — shared by q144's funnel, q278's stage
    * latencies and q282's stage values (one window sort, many
    * readers).
    */
  private def sessionedEvents(spark: SparkSession, dir: String)
      : DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("session_id"), col("event_type"),
        col("event_id"), col("ts"), col("value"))
  }

  /** Funnel value by furthest stage (q282): every session bucketed by
    * the deepest q144 stage it reached — no view / view only / click
    * but no purchase / purchased — with exact session-value cents per
    * bucket. This is the "how much money is stuck at each stage"
    * table: f2 is the abandoned-cart mass q144's counts only imply.
    * Buckets are EXCLUSIVE (each session counted once), so the n_
    * column partitions q144's s0 exactly — spec-asserted.
    *
    * 100 TB shape: rides q144's chain (one sessionization sort, three
    * session-grain stage aggregates) plus one session-grain cent sum;
    * the stitch joins are all at session grain and the output is 4
    * rows.
    */
  def funnelValueByStage(spark: SparkSession, dir: String): DataFrame = {
    val ev = sessionedEvents(spark, dir)
    val keys = Seq("user_id", "session_id")
    val cents = ev.groupBy(keys.map(col): _*)
      .agg((sum(col("value").cast("decimal(18,2)")) * 100)
        .cast("long").as("cents"))
    val tv = ev.filter(col("event_type") === "view")
      .groupBy(keys.map(col): _*).agg(min(col("event_id")).as("tv"))
    val tc = ev.filter(col("event_type") === "click")
      .join(tv, keys).filter(col("event_id") > col("tv"))
      .groupBy(keys.map(col): _*).agg(min(col("event_id")).as("tc"))
    val tp = ev.filter(col("event_type") === "purchase")
      .join(tc, keys).filter(col("event_id") > col("tc"))
      .groupBy(keys.map(col): _*).agg(min(col("event_id")).as("tp"))
    cents
      .join(tv, keys, "left").join(tc, keys, "left")
      .join(tp, keys, "left")
      .withColumn("stage",
        when(col("tp").isNotNull, "f3_purchased")
          .when(col("tc").isNotNull, "f2_click_no_purchase")
          .when(col("tv").isNotNull, "f1_view_only")
          .otherwise("f0_no_view"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("cents")).as("cents"))
      .orderBy(col("stage"))
  }

  /** Funnel stage-latency deciles (q278): for the two q144 stage
    * transitions — view→first qualifying click and click→first
    * qualifying purchase inside one session — the exact decile table
    * of the elapsed seconds, via the q200 value-histogram fold (the
    * latency DISTRIBUTION q250's daily means cannot show; this is
    * where "the funnel is fine at the median, broken at p90" becomes
    * visible). Stage anchor ids are exact min event ids (ids are
    * strictly time-ordered — the q144 contract), so each anchor's
    * `min(ts)` is that same event's timestamp and every latency is
    * exact integer seconds.
    *
    * 100 TB shape: rides q144's chain (sessionization sort + three
    * session-grain aggregates); latencies collapse map-side into a
    * (transition, gap_sec) value histogram, and decile selection runs
    * on those bounded rows — no row-grain sort anywhere (the q200
    * discipline).
    */
  def funnelLatencyDeciles(spark: SparkSession, dir: String): DataFrame = {
    val ev = sessionedEvents(spark, dir)
    val keys = Seq("user_id", "session_id")
    val tv = ev.filter(col("event_type") === "view")
      .groupBy(keys.map(col): _*)
      .agg(min(col("event_id")).as("tv"), min(col("ts")).as("tv_ts"))
    val tc = ev.filter(col("event_type") === "click")
      .join(tv, keys).filter(col("event_id") > col("tv"))
      .groupBy(keys.map(col): _*)
      .agg(min(col("event_id")).as("tc"), min(col("ts")).as("tc_ts"),
        first(col("tv_ts")).as("tv_ts"))
    val tp = ev.filter(col("event_type") === "purchase")
      .join(tc.select(col("user_id"), col("session_id"), col("tc"),
        col("tc_ts")), keys)
      .filter(col("event_id") > col("tc"))
      .groupBy(keys.map(col): _*)
      .agg(min(col("ts")).as("tp_ts"), first(col("tc_ts")).as("tc_ts"))
    def gaps(df: DataFrame, a: String, b: String, name: String) =
      df.select(lit(name).as("transition"),
        floor((expr(s"unix_micros(cast($b as timestamp))") -
          expr(s"unix_micros(cast($a as timestamp))")) /
          lit(1000000L)).cast("long").as("gap_sec"))
    latencyDeciles(
      gaps(tc, "tv_ts", "tc_ts", "t1_view_to_click")
        .unionByName(gaps(tp, "tc_ts", "tp_ts", "t2_click_to_purchase")))
  }

  /** The q278 decile-selection fold over (transition, gap_sec) rows —
    * shared by the batch latencies and q285's streaming drain (the
    * stage-timestamp state carries everything the gaps need).
    */
  private[graft] def latencyDeciles(gapRows: DataFrame): DataFrame = {
    val hist = gapRows
      .groupBy(col("transition"), col("gap_sec"))
      .agg(count(lit(1)).as("cnt"))
    val byT = Window.partitionBy(col("transition"))
    val cum = hist
      .withColumn("cum",
        sum(col("cnt")).over(byT.orderBy(col("gap_sec"))))
      .withColumn("n", sum(col("cnt")).over(byT))
    val decs = explode(array((1 to 9).map(d => lit(d.toLong)): _*))
    cum.select(col("transition"), col("gap_sec"), col("cnt"),
        col("cum"), col("n"), decs.as("decile"))
      .withColumn("r", ceil(col("decile").cast("double") *
        col("n").cast("double") / lit(10.0)).cast("long"))
      .filter(col("r") > col("cum") - col("cnt") && col("r") <= col("cum"))
      .select(col("transition"), col("decile"),
        col("gap_sec").as("gap_sec"), col("n").as("n_transitions"))
      .orderBy(col("transition"), col("decile"))
  }

  /** Markov stationary distribution (q338): the long-run occupancy of
    * the q198 transition chain — power iteration p ← normalize(p·M)
    * from the uniform start for a FIXED number of rounds, which makes
    * the whole computation deterministic and oracled round-for-round
    * (the q327 determinism discipline applied to a stochastic
    * matrix). Types without outgoing transitions lose mass to the
    * renormalization — spelled identically in both engines. Where the
    * q198 matrix says what happens NEXT, this says where user
    * attention settles.
    *
    * 100 TB shape: the matrix is ≤ #types² rows (a broadcast model);
    * each round is one bounded join + fold, persisted as a barrier;
    * only the initial pair extraction touches event grain.
    */
  def markovStationary(spark: SparkSession, dir: String,
      iters: Int = 10): DataFrame =
    stationaryFromCounts(spark,
      transitionPairs(
        Tables.events(spark, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("is_state", lit(0)))
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n")),
      iters)

  /** The q338 finish off the (from, to, n) count grain — shared by
    * the batch chain and q343's streaming drain (the same maintained
    * transition counts q269 drains as a matrix).
    */
  private[graft] def stationaryFromCounts(spark: SparkSession,
      countsRaw: DataFrame, iters: Int = 10): DataFrame = {
    import spark.implicits._
    // The transition matrix is (event-type vocabulary)² — a DOMAIN
    // constant (like the ANN codebooks), not corpus-scaled — so the
    // K-round power iteration over it is driver arithmetic, not a
    // distributed job chain: the previous shape paid 10 rounds of
    // (join + two aggregates + eager localCheckpoint) over a ~5-row
    // relation, ~0.5 s of pure machinery per round. A structural cap
    // keeps the honesty guard: an unexpectedly wide vocabulary falls
    // back to the distributed loop below, identical arithmetic.
    val mRows = countsRaw.collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2)))
    if (mRows.length <= 100000) {
      val rowSums = mRows.groupBy(_._1).view.mapValues(_.map(_._3).sum)
        .toMap
      val pt = mRows.map { case (f, t, n) =>
        (f, t, n.toDouble / rowSums(f).toDouble) }
      val types = (mRows.map(_._1) ++ mRows.map(_._2)).distinct
      var p: Map[String, Double] =
        types.map(_ -> 1.0 / types.length.toDouble).toMap
      (1 to iters).foreach { _ =>
        val pin = pt.groupBy(_._2).view.mapValues(
          _.map { case (f, _, w) => p(f) * w }.sum).toMap
        val z = pin.values.sum
        p = types.map(t => t -> pin.getOrElse(t, 0.0) / z).toMap
      }
      return types.map(t =>
          (t, rowSums.getOrElse(t, 0L), p(t)))
        .toSeq.toDF("event_type", "n_out", "stationary_p")
        .orderBy(col("event_type"))
    }
    val counts = countsRaw.persist()
    val rowSums = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("rs"))
    val m = counts.join(rowSums, Seq("from_type"))
      .select(col("from_type"), col("to_type"),
        (col("n").cast("double") / col("rs").cast("double")).as("pt"))
      .persist()
    // lineage is TRUNCATED at every round boundary (localCheckpoint):
    // ten join rounds over an un-truncated plan tree blow analysis/
    // codegen memory even though the DATA is #types rows
    val types = counts.select(col("from_type").as("t"))
      .unionAll(counts.select(col("to_type").as("t")))
      .distinct().localCheckpoint(true)
    val nT = types.count()
    var pv = types.withColumn("p", lit(1.0) / lit(nT.toDouble))
      .localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val raw = pv.select(col("t"), col("p").as("pw"))
        .join(m, col("t") === col("from_type"))
        .groupBy(col("to_type"))
        .agg(sum(col("pw") * col("pt")).as("pin"))
      val z = raw.agg(sum(col("pin")).as("z"))
      pv = types
        .join(raw.select(col("to_type").as("t"), col("pin")),
          Seq("t"), "left")
        .crossJoin(broadcast(z))
        .select(col("t"),
          (coalesce(col("pin"), lit(0.0)) / col("z")).as("p"))
        .localCheckpoint(true)
    }
    pv.join(rowSums.select(col("from_type").as("t"), col("rs")),
        Seq("t"), "left")
      .select(col("t").as("event_type"),
        coalesce(col("rs"), lit(0L)).as("n_out"),
        col("p").as("stationary_p"))
      .orderBy(col("event_type"))
  }

  /** Session concurrency curve (q290): per day, how many sessions ran
    * AT ONCE at the day's busiest instant — the capacity-planning
    * number (peak concurrent load) that per-day session COUNTS
    * (q20/q271) cannot show. Classic sweep line: every session
    * becomes a +1 boundary at its first event and a −1 at its last,
    * the running sum of boundaries in global (ts, start-before-end)
    * order IS the live-session count, and the per-day max of that sum
    * is the peak. Sessions are closed intervals (a session is live at
    * both endpoint instants; at an exact tie, starts sort before
    * ends), and single-event sessions contribute a +1/−1 pair at one
    * instant. Cross-midnight sessions carry into the next day via the
    * day-grain carry term.
    *
    * 100 TB shape: rides the one q20 sessionization sort, collapses
    * to SESSION grain (2 boundary rows per session), then splits the
    * global running sum the q205 two-phase way: an intra-day running
    * sum (windows partitioned by day) plus a day-grain carry
    * cumulative (≤ #days rows, the bounded single-partition
    * discipline q273/q291 use). The peak within a day is
    * carry + max(intra running) since the carry is constant inside a
    * day. Exact: every term is a BIGINT count, and the max of the
    * prefix-sum sequence is invariant to permutation inside an equal
    * (ts, delta) tie group (all increments in the group are equal).
    */
  def sessionConcurrency(spark: SparkSession, dir: String): DataFrame =
    concurrencyOf(sessionedEvents(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts")))

  /** The q290 sweep-line finish off the session (start_ts, end_ts)
    * grain — shared by the batch report and q298's streaming drain
    * (the funnel-stages state carries each session's first/last ts,
    * which min/max-merge exactly).
    */
  private[graft] def concurrencyOf(sess: DataFrame): DataFrame = {
    val usPerDay = 86400000000L
    val bounds = sess
      .select(col("start_ts").as("ts"), lit(1L).as("delta"))
      .unionAll(sess.select(col("end_ts").as("ts"), lit(-1L).as("delta")))
      .withColumn("day",
        expr(s"unix_micros(cast(ts as timestamp)) div $usPerDay"))
    val dayTotals = bounds.groupBy(col("day")).agg(
      sum(col("delta")).as("net"),
      sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"),
      sum(when(col("delta") === -1L, 1L).otherwise(0L)).as("n_ends"))
    val carryW = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = dayTotals.withColumn("carry",
      coalesce(sum(col("net")).over(carryW), lit(0L)))
    val intraW = Window.partitionBy(col("day"))
      .orderBy(col("ts"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peaks = bounds.withColumn("run", sum(col("delta")).over(intraW))
      .groupBy(col("day")).agg(max(col("run")).as("peak"))
    carried.join(peaks, Seq("day"))
      .select(col("day"), col("n_starts"), col("n_ends"),
        (col("carry") + col("peak")).as("max_concurrent"))
      .orderBy(col("day"))
  }
}
