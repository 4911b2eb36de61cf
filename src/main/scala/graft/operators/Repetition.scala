package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalytics
import graft.sources.Tables

/** Repetition / boilerplate screens (q423–q425, block 35): the
  * Gopher-style per-document quality rules that catch DEGENERATE text
  * the q24 flag's coarse ratios miss — a document dominated by one
  * repeated bigram, or a collapsed vocabulary. Three declared rules
  * with the contract family's severity discipline (some rules HOLD on
  * the fixture and certify the band, others FIRE so the counts are
  * non-vacuous):
  *   r1 mean word length ∈ [3, 10]   — holds (0 failures)
  *   r2 top-bigram fraction ≤ 0.08   — fires (~7% of docs)
  *   r3 distinct-token ratio ≥ 0.35  — fires on the repetitive tail
  *
  * 100 TB shape: r1/r3 are row-local; r2's mode-per-doc runs at the
  * (doc, bigram) count grain — the same map-side-combined shape as
  * the window machinery, hashes/grams only. The per-source cells
  * sum-merge (rules are stateless per doc), so the q425 twin shares
  * the batch SQL.
  */
object Repetition {

  private val Top2Max = 0.08
  private val DistinctMin = 0.35

  /** Per-doc metrics + rule flags. */
  private[graft] def screenedDocs(docs: DataFrame): DataFrame = {
    val toks = Dedup.tokenizedDocs(docs.select(col("doc_id"), col("text")))
    // bigrams leave the scan row-locally (HOF over the token array —
    // no token-grain window shuffle); only (doc, gram) pairs shuffle
    val bi = toks.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => concat_ws(" ", element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2)))).as("g"))
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") /
        sum(col("c")).cast("double")).as("top2_frac"))
    toks
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (aggregate(col("toks"), lit(0L), (a, x) => a + length(x))
          .cast("double") / size(col("toks")).cast("double"))
          .as("mean_word_len"),
        (size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double")).as("distinct_ratio"))
      .join(bi, Seq("doc_id"), "left")
      .withColumn("top2_frac", coalesce(col("top2_frac"), lit(0.0)))
      .withColumn("fail_wordlen",
        !col("mean_word_len").between(3.0, 10.0))
      .withColumn("fail_top2", col("top2_frac") > Top2Max)
      .withColumn("fail_repetition", col("distinct_ratio") < DistinctMin)
  }

  /** Repetition screen work list (q423): the docs failing ANY rule,
    * with their metrics and flags — what a curation pass routes to
    * removal or truncation.
    */
  def repetitionScreen(spark: SparkSession, dir: String): DataFrame =
    screenedDocs(Tables.documents(spark, dir))
      .filter(col("fail_wordlen") || col("fail_top2") ||
        col("fail_repetition"))
      .select(col("doc_id"), col("n_tokens"), col("mean_word_len"),
        col("top2_frac"), col("distinct_ratio"), col("fail_wordlen"),
        col("fail_top2"), col("fail_repetition"))
      .orderBy(col("doc_id"))

  /** Per-source (kind → cnt) cells — sum-merge (the q425 state). */
  private[graft] def screenCells(docs: DataFrame): DataFrame =
    screenedDocs(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(when(col("fail_wordlen"), 1L).otherwise(0L)).as("f_wl"),
        sum(when(col("fail_top2"), 1L).otherwise(0L)).as("f_t2"),
        sum(when(col("fail_repetition"), 1L).otherwise(0L)).as("f_rep"),
        sum(when(!col("fail_wordlen") && !col("fail_top2") &&
          !col("fail_repetition"), 1L).otherwise(0L)).as("pass"))
      .select(col("source"), expr(
        "stack(5, 'docs', docs, 'f_wl', f_wl, 'f_t2', f_t2, " +
          "'f_rep', f_rep, 'pass', pass) as (kind, cnt)"))

  /** Drain: the q424 row shape from the cells. */
  private[graft] def screenFromCells(cells: DataFrame): DataFrame = {
    def k(kind: String) =
      sum(when(col("kind") === kind, col("cnt")).otherwise(0L))
    cells.groupBy(col("source"))
      .agg(k("docs").as("n_docs"), k("f_wl").as("n_fail_wordlen"),
        k("f_t2").as("n_fail_top2"), k("f_rep").as("n_fail_repetition"),
        k("pass").as("n_pass"))
      .select(col("source"), col("n_docs"), col("n_fail_wordlen"),
        col("n_fail_top2"), col("n_fail_repetition"), col("n_pass"),
        (col("n_pass").cast("double") / col("n_docs").cast("double"))
          .as("pass_rate"))
      .orderBy(col("source"))
  }

  /** Screen rollup (q424): per source, rule failures and pass rate —
    * the table that routes a source to the repetition filter.
    */
  def screenRollup(spark: SparkSession, dir: String): DataFrame =
    screenFromCells(screenCells(Tables.documents(spark, dir)))

  /** Streaming screen (q425): the cells sum-merge per micro-batch;
    * shares q424's SQL.
    */
  def streamingScreen(spark: SparkSession, dir: String): DataFrame =
    screenFromCells(
      graft.streaming.StreamingOps.repetitionCellState(spark, dir))
}
