package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact sign-test significance for retrieval comparisons (q435–q436,
  * block 41) — the eval-harness step the r14 verdict named: q402 says
  * the IVF index agrees with brute force "about this much"; a release
  * decision needs "is the difference REAL on this query set", and a
  * bootstrap is both nondeterministic and un-oracle-able. The sign
  * test is the standard paired, distribution-free answer, and with
  * n ≤ 20 queries the binomial tail is EXACT INTEGER arithmetic —
  * factorials through 20! fit a 64-bit long — so the whole inference
  * (wins, losses, the two-sided tail C(n,k..n), the α = 0.05 verdict)
  * is hash-oracled, no FP anywhere.
  *
  * Two paired metrics over the q399/q402 grain, one row each:
  *   hits_at_10      — label hits in the top 10 (bigger wins)
  *   first_rel_rank  — rank of the first relevant hit within the top
  *                     10, absence = 11 (smaller wins)
  * Ties drop out (the sign test conditions on n_eff = wins + losses);
  * `significant_05` spells the two-sided exact test
  * 2·Σ_{i=k}^{n} C(n,i) ≤ 0.05·2^n as the integer inequality
  * 40·p_num ≤ p_den.
  *
  * 100 TB shape: everything after the (already bounded) per-query
  * metric tables is arithmetic over ≤ #queries rows; the binomial fold
  * is a ≤ 21-element HOF on one row.
  */
object SignTest {

  private val K = 10

  /** Per-query paired hits (q435): brute vs IVF label hits in the top
    * 10 and the outcome under "bigger wins".
    */
  def signTable(spark: SparkSession, dir: String): DataFrame =
    hitsPairs(spark, dir)
      .select(col("q_id"), col("hits_brute"), col("hits_ivf"),
        outcome(col("hits_ivf") > col("hits_brute"),
          col("hits_ivf") < col("hits_brute")).as("outcome"))
      .orderBy(col("q_id"))

  private def outcome(win: Column, loss: Column): Column =
    when(win, "win").when(loss, "loss").otherwise("tie")

  private def hitsPairs(spark: SparkSession, dir: String): DataFrame = {
    val hit = sum(when(col("label") === col("q_label"), 1L)
      .otherwise(0L))
    val b = RetrievalEval.bruteRanked(RetrievalEval.corpus(spark, dir))
      .filter(col("rank") <= K)
      .groupBy(col("q_id")).agg(hit.as("hits_brute"))
    val i = RetrievalEval.ivfRanked(spark, dir)
      .groupBy(col("q_id")).agg(hit.as("hits_ivf"))
    // a query whose probed lists return nothing scores 0, not absent
    b.join(i, Seq("q_id"), "left")
      .select(col("q_id"), col("hits_brute"),
        coalesce(col("hits_ivf"), lit(0L)).as("hits_ivf"))
  }

  private def rankPairs(spark: SparkSession, dir: String): DataFrame = {
    def firstRel(ranked: DataFrame): DataFrame = ranked
      .filter(col("rank") <= K && col("label") === col("q_label"))
      .groupBy(col("q_id")).agg(min(col("rank")).as("r"))
    val b = firstRel(RetrievalEval.bruteRanked(
      RetrievalEval.corpus(spark, dir)))
    val i = firstRel(RetrievalEval.ivfRanked(spark, dir))
    // all 20 queries, absence = rank 11 (beyond the window)
    RetrievalEval.corpus(spark, dir)
      .filter(col("vec_id") >= 1 && col("vec_id") <= 20)
      .select(col("vec_id").as("q_id"))
      .join(b.select(col("q_id"), col("r").as("r_brute")),
        Seq("q_id"), "left")
      .join(i.select(col("q_id"), col("r").as("r_ivf")),
        Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("r_brute"), lit(K + 1L)).as("r_brute"),
        coalesce(col("r_ivf"), lit(K + 1L)).as("r_ivf"))
  }

  /** The exact sign-test summary (q436), one row per metric: win/loss/
    * tie counts, the extreme count k, the exact two-sided binomial
    * tail as an integer fraction p_num/p_den, and the α = 0.05
    * verdict — all integers end to end.
    */
  def signSummary(spark: SparkSession, dir: String): DataFrame = {
    val hits = hitsPairs(spark, dir)
      .select(lit("hits_at_10").as("metric"),
        outcome(col("hits_ivf") > col("hits_brute"),
          col("hits_ivf") < col("hits_brute")).as("o"))
    val ranks = rankPairs(spark, dir)
      .select(lit("first_rel_rank").as("metric"),
        outcome(col("r_ivf") < col("r_brute"),
          col("r_ivf") > col("r_brute")).as("o"))
    hits.unionByName(ranks)
      .groupBy(col("metric"))
      .agg(sum(when(col("o") === "win", 1L).otherwise(0L))
        .as("n_wins"),
        sum(when(col("o") === "loss", 1L).otherwise(0L))
          .as("n_losses"),
        sum(when(col("o") === "tie", 1L).otherwise(0L)).as("n_ties"))
      .withColumn("n_eff", col("n_wins") + col("n_losses"))
      .withColumn("k_extreme", greatest(col("n_wins"), col("n_losses")))
      // exact binomial tail: Σ_{i=k}^{n} n!/(i!(n−i)!) — n ≤ 20 keeps
      // every term and the sum inside Long
      .withColumn("p_num", expr("aggregate(sequence(k_extreme, n_eff), " +
        "0L, (acc, i) -> acc + factorial(CAST(n_eff AS INT)) div " +
        "(factorial(CAST(i AS INT)) * factorial(CAST(n_eff - i AS INT))))"))
      .withColumn("p_den", expr("shiftleft(1L, CAST(n_eff AS INT))"))
      .select(col("metric"), col("n_wins"), col("n_losses"),
        col("n_ties"), col("n_eff"), col("k_extreme"), col("p_num"),
        col("p_den"),
        // two-sided p = min(1, 2·p_num/p_den) ≤ 0.05 ⇔ 40·p_num ≤ p_den
        (lit(40L) * col("p_num") <= col("p_den")).as("significant_05"))
      .orderBy(col("metric"))
  }
}
