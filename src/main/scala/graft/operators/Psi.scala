package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalytics
import graft.sources.Tables

/** Population-stability drift (q419–q421, block 33): the PSI monitor
  * between the TRAIN and TEST splits on the curriculum difficulty
  * bands — "is the eval set distributed like the training set?", the
  * check that catches a benchmark drifting away from the training
  * distribution (or a split rule gone wrong) before anyone trusts an
  * eval number. Composes two shipped rules: the q136 md5 split and
  * the q394 integer score bands; counts are exact integers, shares
  * and the per-band PSI term are one division/log each (row-local,
  * deterministic), and the PSI total folds the ≤4 band terms in
  * fixed band order (the q401 left-fold discipline).
  *
  * 100 TB shape: one row-local scan → (band, split) cells (≤ 8 rows),
  * which also SUM-merge — the q421 twin maintains them per
  * micro-batch and shares the batch SQL.
  */
object Psi {

  /** (band, split) → n cells — sum-merge (the q421 state). */
  private[graft] def psiCells(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"))
      .select(col("doc_id"),
        TextAnalytics.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        expr("(size(array_distinct(toks)) * 1000L) div size(toks)")
          .as("score"))
      .withColumn("band",
        when(col("score") < 375, 0L).when(col("score") < 475, 1L)
          .when(col("score") < 625, 2L).otherwise(3L))
      .withColumn("split", TextOps.splitCol("doc_id"))
      .filter(col("split") =!= "val")
      .groupBy(col("band"), col("split"))
      .agg(count(lit(1)).as("cnt"))

  /** Drain: the q419 per-band table from the cells. */
  private[graft] def psiFromCells(cells: DataFrame): DataFrame = {
    // barrier: the share totals and the output rows both read the
    // band table — persist it or the upstream corpus scan runs twice
    // (the q378 double-scan lesson)
    val byBand = cells.groupBy(col("band"))
      .agg(sum(when(col("split") === "train", col("cnt")).otherwise(0L))
        .as("n_train"),
        sum(when(col("split") === "test", col("cnt")).otherwise(0L))
          .as("n_test"))
      .persist()
    graft.Caches.onRelease(() =>
      try byBand.unpersist(false) catch { case _: Throwable => () })
    byBand
      .crossJoin(broadcast(byBand.agg(
        sum(col("n_train")).as("tt"), sum(col("n_test")).as("te"))))
      .select(col("band"), col("n_train"), col("n_test"),
        (col("n_train").cast("double") / col("tt").cast("double"))
          .as("p_train"),
        (col("n_test").cast("double") / col("te").cast("double"))
          .as("p_test"))
      .withColumn("psi_term",
        (col("p_train") - col("p_test")) *
          log(col("p_train") / col("p_test")))
      .orderBy(col("band"))
  }

  /** PSI band table (q419): per difficulty band, train/test counts,
    * shares, and the PSI term. Bands with mass on both sides only
    * (guaranteed on the fixture; a one-sided band is the alert that
    * needs no index anyway).
    */
  def psiBands(spark: SparkSession, dir: String): DataFrame =
    psiFromCells(psiCells(Tables.documents(spark, dir)))

  /** PSI total (q420): the band terms folded in FIXED band order
    * (sorted struct list, left fold from 0.0 — cross-engine exact),
    * with the standard read of the number (<0.1 stable, <0.25 watch,
    * else drifted).
    */
  def psiTotal(spark: SparkSession, dir: String): DataFrame =
    psiBands(spark, dir)
      .agg(aggregate(
        sort_array(collect_list(struct(col("band"), col("psi_term")))),
        lit(0.0), (acc, x) => acc + x.getField("psi_term")).as("psi"))
      .select(col("psi"),
        when(col("psi") < 0.1, "stable").when(col("psi") < 0.25, "watch")
          .otherwise("drifted").as("verdict"))

  /** Streaming PSI (q421): the (band, split) cells sum-merge per
    * micro-batch; shares q419's SQL — the drift monitor stays current
    * as the corpus arrives.
    */
  def streamingPsi(spark: SparkSession, dir: String): DataFrame =
    psiFromCells(
      graft.streaming.StreamingOps.psiCellState(spark, dir))
}
