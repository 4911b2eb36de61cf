package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalytics
import graft.sources.Tables

/** In-engine TRAINED quality classifier (q239 train / q240 apply) —
  * the learned curation stage every production corpus pipeline runs
  * (the CCNet/fastText step) that the r10 verdict flagged as the one
  * missing curation component: the existing surface has lexicons
  * (q194), lift tables, scorecards (q211) and funnels (q141/q226),
  * but no model that GENERALIZES from a labeled signal to unseen
  * documents.
  *
  * Model: multinomial Naive Bayes over token counts, trained against
  * the q211 composite quality flag as the (weak) label. Everything is
  * exact-integer sufficient statistics combined by ONE shared double
  * formula per value (the q212/q236 oracle discipline), and the
  * per-token log-odds are FIXED-POINT-ROUNDED to micro units BEFORE
  * the per-document sum — so document scores are exact BIGINT sums of
  * BIGINT weights (order-independent, associative, cross-engine
  * hash-identical), never a float accumulation whose order could
  * drift between engines or partitionings.
  *
  *  - vocabulary: top `VocabSize` tokens by corpus occurrence count
  *    (ties broken by token — deterministic in both engines);
  *  - per-token weight: w = ln((n1+1)/(T1+V)) − ln((n0+1)/(T0+V)),
  *    Laplace-smoothed class-conditional log-odds over vocab-restricted
  *    totals, emitted as w_micro = floor(w·1e6 + 0.5);
  *  - per-doc score: prior_micro + Σ count(d,t)·w_micro(t), gate at
  *    score > 0.
  *
  * 100 TB shape: training is one explode + one map-side-combined
  * (token, class) count aggregate (vocab-sized output) + a V-row
  * model; application BROADCASTS the V-row model into the corpus scan
  * — a map-side hash join at token grain, one per-doc aggregate, no
  * corpus-side shuffle beyond the doc_id grouping of its own exploded
  * rows. The trained model is exactly the bounded artifact a real run
  * persists next to the corpus (the q128 vocab-table discipline).
  */
object QualityModel {

  private[graft] val VocabSize = 256

  /** (doc_id, toks, y) — the q211 quality flag as the training label. */
  private[graft] def flagged(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      TextAnalytics.tokens(col("text")).as("toks"),
      TextAnalytics.qualityFlag(col("text")).as("y"))

  /** Per-token per-class occurrence counts (token, cnt, n1, n0) — the
    * model's sufficient statistics. SUM-mergeable across disjoint doc
    * sets, which is what the streaming maintenance twin (q246)
    * appends per micro-batch.
    */
  private[graft] def tokenClassCounts(d: DataFrame): DataFrame = d
    .select(col("y"), explode(col("toks")).as("token"))
    .groupBy(col("token"))
    .agg(count(lit(1)).as("cnt"),
      sum(col("y")).as("n1"),
      sum(lit(1L) - col("y")).as("n0"))

  /** Vocab selection + fixed-point log-odds over a sufficient-
    * statistics relation — the drain half q246 shares with q239.
    */
  private[graft] def weightsFromCounts(counts: DataFrame): DataFrame = {
    val vocab = counts
      .orderBy(col("cnt").desc, col("token"))
      .limit(VocabSize)
    val totals = vocab.agg(
      sum(col("n1")).as("t1"), sum(col("n0")).as("t0"))
    vocab.crossJoin(broadcast(totals))
      .withColumn("w_micro",
        floor((log((col("n1") + 1L).cast("double") /
          (col("t1") + lit(VocabSize.toLong)).cast("double")) -
          log((col("n0") + 1L).cast("double") /
            (col("t0") + lit(VocabSize.toLong)).cast("double"))) *
          lit(1e6) + lit(0.5)).cast("long"))
      .select(col("token"), col("n1"), col("n0"), col("w_micro"))
  }

  /** The trained model relation: (token, n1, n0, w_micro). */
  private[graft] def trainDf(d: DataFrame): DataFrame =
    weightsFromCounts(tokenClassCounts(d))

  /** q239: train — the model table, ordered for the oracle. */
  def nbTrain(spark: SparkSession, dir: String): DataFrame =
    trainDf(flagged(Tables.documents(spark, dir)))
      .orderBy(col("token"))

  /** Per-document scored relation (doc_id, y, n_vocab_tokens,
    * score_micro, predicted) — unordered; q240/q247/q248 share it.
    */
  private[graft] def scoredDocs(spark: SparkSession,
      dir: String): DataFrame = {
    val d = flagged(Tables.documents(spark, dir))
      // barrier: feeds training, the priors, and the scoring pass
      .persist()
    val model = trainDf(d)
    val priors = d.agg(
        count(lit(1)).as("n"), sum(col("y")).as("n1"))
      .select(floor((log((col("n1") + 1L).cast("double") /
          (col("n") + 2L).cast("double")) -
        log((col("n") - col("n1") + 1L).cast("double") /
          (col("n") + 2L).cast("double"))) * lit(1e6) + lit(0.5))
        .cast("long").as("prior_micro"))
    val perDoc = d
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .join(broadcast(model.select(col("token"), col("w_micro"))),
        Seq("token"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_vocab_tokens"),
        sum(col("w_micro")).as("wsum"))
    d.select(col("doc_id"), col("y"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_vocab_tokens", "wsum"))
      .crossJoin(broadcast(priors))
      .select(col("doc_id"), col("y"),
        col("n_vocab_tokens"),
        (col("prior_micro") + col("wsum")).as("score_micro"),
        when(col("prior_micro") + col("wsum") > 0L, 1L).otherwise(0L)
          .as("predicted"))
  }

  /** q240: apply — per-document fixed-point log-odds score + gate,
    * with the weak label alongside so the table doubles as the
    * confusion audit.
    */
  def nbApply(spark: SparkSession, dir: String): DataFrame =
    scoredDocs(spark, dir).orderBy(col("doc_id"))

  /** q287: exact ROC AUC of the trained score vs the length baseline —
    * the one-number ranking-quality comparison behind the r10 advice
    * "classifier must beat the length baseline", now an oracled TABLE
    * instead of a spec assertion. AUC is the Mann-Whitney rank-sum
    * computed over the SCORE HISTOGRAM with exact tie handling: for
    * each distinct score, positives there credit one half-point per
    * tied negative and one point per lower-scored negative, so
    * num2 = Σ np·(2·neg_below + nn) and AUC = num2 / (2·P·N) — all
    * integer arithmetic until the single final division.
    *
    * 100 TB shape: docs collapse once per scorer to the per-score
    * (np, nn) histogram (map-side combined); the cumulative
    * negatives-below walk is the q205 two-phase prefix sum
    * (range-partition by score, per-partition local prefix, bounded
    * partition offsets through the driver) — no single-partition
    * window over the score domain, which for the micro-score is
    * corpus-grain.
    */
  def nbAuc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val base = scoredDocs(spark, dir)
      .join(Tables.documents(spark, dir)
        .select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .select(col("y"), col("score_micro"), col("n_chars"))
      .persist()
    def aucOf(scoreCol: String, name: String): DataFrame = {
      val hist = base
        .groupBy(col(scoreCol).as("score"))
        .agg(sum(col("y")).as("np"),
          sum(lit(1L) - col("y")).as("nn"))
        .repartitionByRange(col("score"))
        .withColumn("pid", spark_partition_id())
        // barrier: the totals pass and the local-prefix pass must see
        // the same materialized partitioning
        .persist()
      val totals = hist.groupBy(col("pid")).agg(sum(col("nn")).as("ps"))
        .collect().sortBy(_.getAs[Int]("pid"))
      var acc = 0L
      val cumOffs = totals.map { r =>
        val o = acc; acc += r.getAs[Long]("ps"); (r.getAs[Int]("pid"), o)
      }.toSeq
      val offDf =
        if (cumOffs.isEmpty) Seq((0, 0L)).toDF("pid", "poff").limit(0)
        else cumOffs.toDF("pid", "poff")
      val wLoc = Window.partitionBy(col("pid")).orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, -1)
      hist
        .withColumn("loc", coalesce(sum(col("nn")).over(wLoc), lit(0L)))
        .join(broadcast(offDf), "pid")
        .withColumn("below", col("loc") + col("poff"))
        .agg(sum(col("np") * (lit(2L) * col("below") + col("nn")))
          .as("num2"),
          sum(col("np")).as("p"), sum(col("nn")).as("n"))
        .select(lit(name).as("scorer"),
          col("p").as("n_pos"), col("n").as("n_neg"),
          (col("num2").cast("double") /
            (lit(2.0) * col("p").cast("double") * col("n").cast("double")))
            .as("auc"))
    }
    aucOf("score_micro", "nb_log_odds")
      .unionByName(aucOf("n_chars", "length_baseline"))
      .orderBy(col("scorer"))
  }

  /** q247: per-source confusion of the trained gate against its weak
    * label — the table that says WHERE the learned stage disagrees
    * with the rule it was trained on (a source with high FP mass is
    * where the classifier generalized PAST the rule; high FN mass is
    * where it under-fits). Exact integer cells; one broadcast-model
    * scan + a #sources-row rollup.
    */
  def nbConfusion(spark: SparkSession, dir: String): DataFrame =
    scoredDocs(spark, dir)
      .join(Tables.documents(spark, dir)
        .select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("y") === 1L && col("predicted") === 1L, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("y") === 0L && col("predicted") === 1L, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("y") === 1L && col("predicted") === 0L, 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("y") === 0L && col("predicted") === 0L, 1L)
          .otherwise(0L)).as("tn"))
      .withColumn("accuracy",
        (col("tp") + col("tn")).cast("double") /
          col("n_docs").cast("double"))
      .orderBy(col("source"))

  /** NB model drift (q255): the classifier trained on the historical
    * snapshot (doc_id % 10 ≠ 9, the q244 split) vs the full corpus,
    * weight tables joined token by token — the q244 tokenizer-drift
    * check applied to the MODEL: if per-token log-odds move materially
    * between snapshots, a cached classifier artifact is stale and the
    * q246 streaming maintenance needs to run before the next gate
    * pass. Vocab membership flags make boundary churn visible; weights
    * outside a vocabulary read 0 with the flag down.
    */
  def nbModelDrift(spark: SparkSession, dir: String,
      batchMod: Int = 10, batchRem: Int = 9): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val snap = trainDf(flagged(
        docs.filter(col("doc_id") % batchMod =!= batchRem)))
      .select(col("token"), col("w_micro").as("w_snap_micro"),
        lit(1L).as("in_snap"))
    val full = trainDf(flagged(docs))
      .select(col("token"), col("w_micro").as("w_full_micro"),
        lit(1L).as("in_full"))
    snap.join(full, Seq("token"), "full_outer")
      .na.fill(0L,
        Seq("in_snap", "in_full", "w_snap_micro", "w_full_micro"))
      .select(col("token"), col("in_snap"), col("in_full"),
        col("w_snap_micro"), col("w_full_micro"),
        when(col("in_snap") === 1L && col("in_full") === 1L,
          col("w_full_micro") - col("w_snap_micro")).otherwise(0L)
          .as("delta_micro"))
      .orderBy(col("token"))
  }

  /** q248: calibration table — fixed-width score bins (2e6 micro =
    * 2 nats of log-odds per bin) against the empirical quality rate.
    * A well-calibrated gate shows rate rising monotonically through
    * bin 0; integer bin arithmetic (floor of an exact-long/double
    * division), so fully oracled.
    */
  def nbCalibration(spark: SparkSession, dir: String,
      binMicro: Long = 2000000L): DataFrame =
    scoredDocs(spark, dir)
      .withColumn("bin",
        floor(col("score_micro").cast("double") /
          lit(binMicro.toDouble)).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("y")).as("n_quality"))
      .withColumn("quality_rate",
        col("n_quality").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("bin"))

  /** Precision/recall threshold sweep (q325): the NB score gated at
    * each of its own score deciles — per decile rank r_d = ⌈d·n/10⌉
    * (docs ordered by ascending score), the threshold score and the
    * exact confusion quadrant of "predict positive when
    * score > threshold", plus precision / recall / F1. F1 is spelled
    * 2·TP / (2·TP + FP + FN) — like precision and recall, ONE
    * division from exact integers. The operating-point table behind
    * q287's single AUC number: which decile cut a curation run should
    * actually gate at.
    *
    * 100 TB shape: docs collapse to the per-score (np, nn) histogram;
    * cumulative counts ride the q205/q287 two-phase prefix (the score
    * domain is corpus-grain — no single-partition window); the decile
    * table (9 rows) range-joins the histogram.
    */
  def nbPrSweep(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val hist = scoredDocs(spark, dir)
      .groupBy(col("score_micro").as("score"))
      .agg(sum(col("y")).as("np"), sum(lit(1L) - col("y")).as("nn"))
      .repartitionByRange(col("score"))
      .withColumn("pid", spark_partition_id())
      // barrier: the totals pass and the local-prefix pass must see
      // the same materialized partitioning
      .persist()
    val totals = hist.groupBy(col("pid"))
      .agg(sum(col("np")).as("pp"), sum(col("nn")).as("pn"))
      .collect().sortBy(_.getAs[Int]("pid"))
    var accP = 0L
    var accN = 0L
    val offs = totals.map { r =>
      val o = (r.getAs[Int]("pid"), accP, accN)
      accP += r.getAs[Long]("pp"); accN += r.getAs[Long]("pn"); o
    }.toSeq
    val offDf =
      if (offs.isEmpty) Seq((0, 0L, 0L)).toDF("pid", "ppoff", "pnoff").limit(0)
      else offs.toDF("pid", "ppoff", "pnoff")
    val wLoc = Window.partitionBy(col("pid")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist
      .withColumn("lp", coalesce(sum(col("np")).over(wLoc), lit(0L)))
      .withColumn("ln", coalesce(sum(col("nn")).over(wLoc), lit(0L)))
      .join(broadcast(offDf), "pid")
      .select(col("score"), col("np"), col("nn"),
        (col("lp") + col("ppoff")).as("np_below"),
        (col("ln") + col("pnoff")).as("nn_below"))
    val tot = ranked.agg(sum(col("np")).as("p"), sum(col("nn")).as("nneg"))
    val decs = spark.range(1, 10).select(col("id").as("decile"))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("p"), col("nneg"),
        expr("(decile * (p + nneg) + 9) div 10").as("r"))
    broadcast(decs).join(ranked,
        col("r") > col("np_below") + col("nn_below") &&
          col("r") <= col("np_below") + col("nn_below") +
            col("np") + col("nn"))
      .withColumn("tp", col("p") - col("np_below") - col("np"))
      .withColumn("fp", col("nneg") - col("nn_below") - col("nn"))
      .withColumn("fn", col("p") - col("tp"))
      .select(col("decile"), col("score").as("threshold_micro"),
        col("tp"), col("fp"), col("fn"),
        (col("nneg") - col("fp")).as("tn"),
        when(col("tp") + col("fp") === 0L, lit(0.0))
          .otherwise(col("tp").cast("double") /
            (col("tp") + col("fp")).cast("double")).as("precision"),
        (col("tp").cast("double") / col("p").cast("double")).as("recall"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") === 0L, lit(0.0))
          .otherwise((lit(2L) * col("tp")).cast("double") /
            (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"))
          .as("f1"))
      .orderBy(col("decile"))
  }

  /** Weight-of-evidence / information-value table (q336): n_chars
    * log2 buckets scored against the q24 quality flag — the
    * credit-scoring-standard "how predictive is this feature, bucket
    * by bucket" report (WOE per bucket, IV contribution, total IV).
    * +1-smoothed rates keep every input an exact integer; two ln
    * calls per bucket (the q158 discipline). The feature-engineering
    * companion to q287's model-level AUC: q287 scores the trained
    * model, this scores the RAW length feature it competes with.
    *
    * 100 TB shape: docs collapse map-side to ≤ ~40 (bucket, y) cells;
    * everything after is cell arithmetic. q337 maintains exactly that
    * cell grain per micro-batch.
    */
  def woeIv(spark: SparkSession, dir: String): DataFrame =
    woeFromCells(woeCellsOf(Tables.documents(spark, dir)))

  /** The (bucket, y, cnt) cell grain — sum-merges, so q337's
    * streaming state is exactly this table.
    */
  private[graft] def woeCellsOf(docs: DataFrame): DataFrame =
    docs.select(
        when(col("n_chars") <= 1L, lit(0L))
          .otherwise(length(bin(col("n_chars"))).cast("long") - 1L)
          .as("bucket"),
        TextAnalytics.qualityFlag(col("text")).as("y"))
      .groupBy(col("bucket"), col("y"))
      .agg(count(lit(1)).as("cnt"))

  /** The q336 finish off the cell grain. */
  private[graft] def woeFromCells(cells: DataFrame): DataFrame = {
    val byBucket = cells.groupBy(col("bucket"))
      .agg(sum(when(col("y") === 1L, col("cnt")).otherwise(0L))
        .as("n_good"),
        sum(when(col("y") === 0L, col("cnt")).otherwise(0L))
          .as("n_bad"))
      .persist()
    val tot = byBucket.agg(sum(col("n_good")).as("g"),
      sum(col("n_bad")).as("b"))
    val scored = byBucket.crossJoin(broadcast(tot))
      .withColumn("pg", (col("n_good") + 1L).cast("double") /
        (col("g") + 1L).cast("double"))
      .withColumn("pb", (col("n_bad") + 1L).cast("double") /
        (col("b") + 1L).cast("double"))
      .withColumn("woe", log(col("pg")) - log(col("pb")))
      .withColumn("iv_contrib", (col("pg") - col("pb")) * col("woe"))
    val iv = scored.agg(sum(col("iv_contrib")).as("iv_total"))
    scored.crossJoin(broadcast(iv))
      .select(col("bucket"), col("n_good"), col("n_bad"), col("woe"),
        col("iv_contrib"), col("iv_total"))
      .orderBy(col("bucket"))
  }

  /** Cohen's kappa agreement (q326): chance-corrected agreement for
    * the engine's two classifiers — the NB gate against its weak
    * label and the q25 lang-id guesser against the labeled lang —
    * computed exactly from integer confusion cells: with marginals
    * r_k (true) and c_k (predicted),
    * κ = (n·Σdiag − Σ r_k·c_k) / (n² − Σ r_k·c_k) — one division;
    * products in decimal(38,0) (n² overflows BIGINT at corpus scale).
    * The one-number "is this classifier better than its own base
    * rates" check next to q247/q309's full matrices.
    */
  def kappaAgreement(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    def kappaOf(cells: DataFrame, task: String): DataFrame = {
      // cells: (t, g, cnt)
      val c = cells.persist()
      val base = c.agg(sum(col("cnt")).as("n"),
        sum(when(col("t") === col("g"), col("cnt")).otherwise(lit(0L)))
          .as("agree"))
      val rc = c.groupBy(col("t").as("k")).agg(sum(col("cnt")).as("r"))
        .join(c.groupBy(col("g").as("k")).agg(sum(col("cnt")).as("cc")),
          Seq("k"), "full_outer")
        .agg(sum(coalesce(col("r"), lit(0L)).cast(dec) *
          coalesce(col("cc"), lit(0L)).cast(dec)).as("src"))
      base.crossJoin(rc)
        .select(lit(task).as("task"), col("n"), col("agree"),
          when(col("n").cast(dec) * col("n").cast(dec) === col("src"),
            lit(0.0))
            .otherwise(
              (col("n").cast(dec) * col("agree").cast(dec) - col("src"))
                .cast("double") /
              (col("n").cast(dec) * col("n").cast(dec) - col("src"))
                .cast("double")).as("kappa"))
    }
    val nbCells = scoredDocs(spark, dir)
      .groupBy(col("y").cast("string").as("t"),
        col("predicted").cast("string").as("g"))
      .agg(count(lit(1)).as("cnt"))
    val langCells = TextOps.confusionCellsOf(Tables.documents(spark, dir))
      .select(col("lang").as("t"), col("lang_guess").as("g"), col("cnt"))
    kappaOf(nbCells, "nb_vs_weak_label")
      .unionAll(kappaOf(langCells, "langid_vs_lang"))
      .orderBy(col("task"))
  }
}
