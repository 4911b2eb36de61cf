package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalytics
import graft.sources.Tables

/** Curriculum / data-ordering + curation budgeting (q394–q398, r13
  * verdict #7's named candidates): the manifest that tells a training
  * loader WHAT ORDER to feed the corpus in, and the greedy budget
  * optimizer that decides WHICH sources to feed at all.
  *
  * Ordering key: a deterministic per-doc difficulty score —
  * lexical-diversity millis, `(distinct_tokens · 1000) div tokens` —
  * exact integer arithmetic both engines spell identically (the q24
  * quality-metric family's discipline), banded into four fixed
  * curriculum phases (thresholds 375/475/625, the fixture quartiles).
  * Repetitive text scores low (phase 0, "easy"), diverse text high —
  * the anti-curriculum flip is one ORDER BY direction.
  *
  * 100 TB shape: the score is row-local inside the scan; the manifest
  * window is PER (phase, shard) — the q178/q101 md5-shard convention,
  * never a global sort (production widens the shard prefix for
  * 256-way parallelism); the phase-mass cells sum-merge (streaming
  * twin shares the batch SQL); the optimizer runs on the #sources-row
  * scorecard relation, so its global greedy window is bounded by the
  * source count, not the corpus.
  */
object Curriculum {

  /** (doc_id, source, shard, n_tokens, score, phase) — the shared
    * row-local base. Score is exact integer millis; `div` keeps the
    * ordering integer (FP-free ties).
    */
  private[graft] def scoredDocs(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        TextAnalytics.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("source"),
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
          .as("shard"),
        size(col("toks")).cast("long").as("n_tokens"),
        expr("(size(array_distinct(toks)) * 1000L) div size(toks)")
          .as("score"))
      .withColumn("phase",
        when(col("score") < 375, 0L).when(col("score") < 475, 1L)
          .when(col("score") < 625, 2L).otherwise(3L))

  /** Phase-mass cells: (phase, kind ∈ docs/tokens) → cnt — sum-merge,
    * the q397 streaming state.
    */
  private[graft] def phaseCells(docs: DataFrame): DataFrame =
    scoredDocs(docs).groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .select(col("phase"), expr(
        "stack(2, 'docs', n_docs, 'tokens', n_tokens) as (kind, cnt)"))

  /** Drain: the q394 row shape from the cells. */
  private[graft] def phasesFromCells(cells: DataFrame): DataFrame = {
    def k(kind: String) =
      sum(when(col("kind") === kind, col("cnt")).otherwise(0L))
    // barrier: the share total and the output rows both read the
    // phase table — persist it or the upstream corpus scan runs twice
    val byPhase = cells.groupBy(col("phase"))
      .agg(k("docs").as("n_docs"), k("tokens").as("n_tokens"))
      .persist()
    graft.Caches.onRelease(() =>
      try byPhase.unpersist(false) catch { case _: Throwable => () })
    byPhase
      .crossJoin(broadcast(
        byPhase.agg(sum(col("n_tokens")).as("tt"))))
      .select(col("phase"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("tt").cast("double"))
          .as("token_share"))
      .orderBy(col("phase"))
  }

  /** Curriculum phase mass (q394): docs/tokens/share per phase — the
    * table that sizes each curriculum stage before the manifest is
    * cut. Cells sum-merge, so q397 shares this SQL.
    */
  def curriculumPhases(spark: SparkSession, dir: String): DataFrame =
    phasesFromCells(phaseCells(Tables.documents(spark, dir)))

  /** Curriculum manifest (q395): the deterministic pack order — per
    * (phase, shard), docs ordered by (score, doc_id) with position
    * and running token offset. The loader consumes shards in
    * parallel, phases in sequence; ties break on doc_id so two runs
    * cut byte-identical manifests (the r13 verdict's "deterministic
    * pack order by quality score with tie-breaks").
    */
  def curriculumManifest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("phase"), col("shard"))
      .orderBy(col("score"), col("doc_id"))
    scoredDocs(Tables.documents(spark, dir))
      .select(col("phase"), col("shard"),
        row_number().over(w).cast("long").as("pos"),
        col("doc_id"), col("score"), col("n_tokens"),
        sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum_tokens"))
      .orderBy(col("phase"), col("shard"), col("pos"))
  }

  /** Curation cost/benefit optimizer (q396): greedy budgeted source
    * selection off the q211 scorecard grain — per source, quality-pass
    * token mass over total token mass is the value DENSITY; sources
    * are taken densest-first until the budget (half the corpus's
    * tokens) is spent, the marginal source taken partially. The
    * greedy-by-density rule is the fractional-knapsack optimum, and
    * the output is the TRAJECTORY (step order, take per step,
    * cumulative spend) — the q154 MMR discipline: oracle the whole
    * decision path, not just the final set.
    */
  def curationOptimizer(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("source"),
        TextAnalytics.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextAnalytics.qualityFlag(col("text")).as("pass"))
      .filter(col("n_tokens") > 0)
    val bySource = docs.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("pass") === 1L, col("n_tokens")).otherwise(0L))
          .as("n_pass_tokens"))
      // barrier: the budget total and the greedy window read the
      // same #sources-row relation
      .persist()
    graft.Caches.onRelease(() =>
      try bySource.unpersist(false) catch { case _: Throwable => () })
    val budget = bySource.agg(
      expr("sum(n_tokens) div 2L").as("budget"))
    // #sources rows: the single-partition greedy window is bounded by
    // the source count, never the corpus
    val w = Window.orderBy(col("density").desc, col("source"))
    bySource
      .select(col("source"), col("n_tokens"), col("n_pass_tokens"),
        (col("n_pass_tokens").cast("double") /
          col("n_tokens").cast("double")).as("density"))
      .crossJoin(broadcast(budget))
      .select(col("source"), col("n_tokens"), col("n_pass_tokens"),
        col("density"),
        row_number().over(w).cast("long").as("step"),
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("cum_before"),
        col("budget"))
      .select(col("step"), col("source"), col("n_tokens"),
        col("n_pass_tokens"), col("density"),
        least(col("n_tokens"),
          greatest(lit(0L), col("budget") - col("cum_before")))
          .as("take_tokens"),
        col("cum_before"))
      .filter(col("take_tokens") > 0)
      .select(col("step"), col("source"), col("n_tokens"),
        col("n_pass_tokens"), col("density"), col("take_tokens"),
        (col("cum_before") + col("take_tokens")).as("cum_tokens"))
      .orderBy(col("step"))
  }

  /** Curriculum-ordered packing audit (q398): q178's fixed-length
    * concat-and-chop run in CURRICULUM order — within each shard docs
    * are packed by (phase, score, doc_id) — rolled up per shard:
    * sequences cut, docs packed, docs spanning a sequence boundary,
    * token mass. The boundary-crossing count is what the ordering
    * changes (similar-length neighbors pack cleaner), so this is the
    * audit that prices the curriculum against the hash-shuffled
    * baseline.
    */
  def curriculumPacked(spark: SparkSession, dir: String,
      seqLen: Int = 64): DataFrame = {
    val L = lit(seqLen.toLong)
    val byPos = Window.partitionBy(col("shard"))
      .orderBy(col("phase"), col("score"), col("doc_id"))
    scoredDocs(Tables.documents(spark, dir))
      .withColumn("off", coalesce(sum(col("n_tokens")).over(
        byPos.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("first_seq", floor(col("off") / L))
      .withColumn("last_seq",
        floor((col("off") + col("n_tokens") - 1) / L))
      .groupBy(col("shard"))
      .agg(max(col("last_seq") + 1).as("n_seqs"),
        count(lit(1)).as("n_docs"),
        sum(when(col("first_seq") =!= col("last_seq"), 1L)
          .otherwise(0L)).as("n_cross"),
        sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("shard"))
  }
}
