package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Preference-data QA (q480–q481, block 62): the hygiene pass an
  * RLHF/DPO preference set needs before training. Two failure modes
  * ruin preference data silently: weak consensus (raters split on a
  * pair) and INTRANSITIVITY (majority says A≻B, B≻C, C≻A — a
  * Condorcet cycle no reward model can fit; gradient just oscillates).
  * Both are relational facts about the pairwise win matrix, computed
  * here exactly.
  *
  * Fixture mapping: each user is a "rater", each event_type a
  * "candidate", and the rater's judgment between two candidates is
  * which one carries more of their value mass (in exact cents — a
  * double sum would make near-ties engine-dependent). q480 is the
  * pairwise matrix (wins per side + raters compared, per unordered
  * pair); q481 derives the majority relation and lists the 3-cycles
  * by triangle self-join — the minimal witnesses of intransitivity.
  *
  * 100 TB shape: the per-(rater, candidate) collapse is one
  * map-side-combined aggregate; pair comparison is a self-join at
  * rater grain with candidate cardinality (not corpus size) fan-out;
  * the majority relation is #candidates² rows and the triangle join
  * runs on THAT, i.e. on metadata.
  */
object Preference {

  /** Per (rater, candidate) exact value mass in cents (the q304
    * `floor(v·100 + 0.5)` discipline — tie-unambiguous in both
    * engines).
    */
  private def raterMass(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS LONG)"))
        .as("cents"))

  /** Rater-grain pairwise judgments for unordered pairs (a < b). */
  private def judgments(spark: SparkSession, dir: String): DataFrame = {
    val m = raterMass(spark, dir).persist()
    val a = m.select(col("user_id"), col("event_type").as("type_a"),
      col("cents").as("cents_a"))
    val b = m.select(col("user_id"), col("event_type").as("type_b"),
      col("cents").as("cents_b"))
    a.join(b, Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .filter(col("cents_a") =!= col("cents_b")) // ties abstain
      .withColumn("a_wins",
        (col("cents_a") > col("cents_b")).cast("long"))
  }

  /** q480: the pairwise preference matrix — per unordered candidate
    * pair: raters compared, wins per side, and the majority margin.
    */
  def preferenceMatrix(spark: SparkSession, dir: String): DataFrame =
    judgments(spark, dir)
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_compared"),
        sum(col("a_wins")).as("n_a_wins"),
        (count(lit(1)) - sum(col("a_wins"))).as("n_b_wins"))
      .withColumn("margin",
        abs(col("n_a_wins") - col("n_b_wins")))
      .orderBy(col("type_a"), col("type_b"))

  /** q481: Condorcet cycles — the majority relation's 3-cycles, each
    * listed once (smallest candidate first). An empty result is the
    * trainability certificate; a row is a concrete witness set to
    * re-adjudicate. On the fixtures: sf0.001/sf0.01 certify clean,
    * sf0.1 surfaces a real cycle (click ≻ signup ≻ purchase ≻
    * click) — both outcomes exercised, both oracled.
    */
  def preferenceCycles(spark: SparkSession, dir: String): DataFrame = {
    // directed majority edges (strict: equal wins = no edge)
    val m = preferenceMatrix(spark, dir)
    val edges = m
      .filter(col("n_a_wins") =!= col("n_b_wins"))
      .select(
        when(col("n_a_wins") > col("n_b_wins"), col("type_a"))
          .otherwise(col("type_b")).as("w"),
        when(col("n_a_wins") > col("n_b_wins"), col("type_b"))
          .otherwise(col("type_a")).as("l"))
      .persist()
    val e1 = edges.select(col("w").as("x"), col("l").as("y"))
    val e2 = edges.select(col("w").as("y"), col("l").as("z"))
    val e3 = edges.select(col("w").as("z"), col("l").as("x"))
    e1.join(e2, Seq("y")).join(e3, Seq("z", "x"))
      // canonical orientation: x is the smallest member
      .filter(col("x") < col("y") && col("x") < col("z"))
      .select(col("x"), col("y"), col("z"))
      .orderBy(col("x"), col("y"), col("z"))
  }
}
