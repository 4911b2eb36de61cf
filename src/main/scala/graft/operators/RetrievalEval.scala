package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Retrieval evaluation suite (q399–q403, block 28): the measurement
  * half of the similarity-search surface — given a retrieval system
  * (brute-force cosine, or the maintained IVF index) and a ground
  * truth, the metrics a RAG/retrieval deployment is judged on:
  * precision/recall@k, MRR, NDCG@k, ANN-vs-brute agreement, and the
  * kNN-classifier confusion matrix.
  *
  * Ground truth is the LABEL relation — a candidate is relevant to a
  * query iff it carries the query's label (embeddings.label, the same
  * rule the q104/q105 centroid family and q239's classifier use) — so
  * relevance is exact data, not an FP threshold, and every metric
  * either is exact integer arithmetic or folds a FIXED-ORDER list of
  * ≤ k doubles (the q91 left-fold discipline), making the whole suite
  * hash-oracled.
  *
  * Query set: vec_id 1..20 (spans labels on the fixture). Scores are
  * raw dot products over double-cast vectors — the q120/q253 parity
  * arithmetic, proven IEEE-identical cross-engine.
  *
  * 100 TB shape: the query set is a bounded broadcast side; per-query
  * candidate mass is one scan for the brute baseline (the honest
  * yardstick — you run it on a sample, which is exactly what the
  * fixture-sized run models) and probed-lists-only for the IVF path;
  * metric rollups are per-query k-row folds. Nothing but (q_id,
  * vec_id, score, label) quadruples ever shuffles.
  */
object RetrievalEval {

  private val K = 10
  private val NQueries = 20

  import org.apache.spark.sql.graft.VectorExpressions.dotNative

  /** (vec_id, v, label) double-cast corpus, persisted — queries,
    * scoring, and label marginals all read it.
    */
  private[operators] def corpus(spark: SparkSession,
      dir: String): DataFrame = {
    val c = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"),
        col("label").cast("long").as("label"))
      .persist()
    graft.Caches.onRelease(() =>
      try c.unpersist(false) catch { case _: Throwable => () })
    c
  }

  /** Brute-force ranking: every (query, candidate≠query) pair scored,
    * ranked per query by (score DESC, vec_id).
    */
  private[operators] def bruteRanked(c: DataFrame): DataFrame = {
    val q = c.filter(col("vec_id") >= 1 && col("vec_id") <= NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("label").as("q_label"))
    q.crossJoin(c.select(col("vec_id"), col("v"), col("label")))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_label"), col("vec_id"), col("label"),
        dotNative(col("qv"), col("v")).as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("vec_id"))).cast("long"))
  }

  /** Precision/recall@10 (q399): per query — relevant corpus mass,
    * hits in the top 10, and the two ratios. All-integer numerators.
    */
  def precisionRecall(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val ranked = bruteRanked(c)
    val rel = c.groupBy(col("label").as("q_label"))
      .agg(count(lit(1)).as("n_label"))
    ranked.filter(col("rank") <= K)
      .groupBy(col("q_id"), col("q_label"))
      .agg(sum(when(col("label") === col("q_label"), 1L).otherwise(0L))
        .as("n_hits"))
      .join(broadcast(rel), Seq("q_label"))
      // the query itself is excluded from the candidate pool
      .select(col("q_id"), col("q_label"),
        (col("n_label") - 1).as("n_rel"), col("n_hits"),
        (col("n_hits").cast("double") / lit(K.toDouble)).as("p_at_10"),
        // a query whose label is unique in the corpus has no relevant
        // candidates: recall is 0 by convention, not 0/0 = NaN (the
        // ndcgAt10 idcg=0 guard, mirrored in the oracle SQL)
        when(col("n_label") > 1, col("n_hits").cast("double") /
          (col("n_label") - 1).cast("double")).otherwise(0.0)
          .as("r_at_10"))
      .orderBy(col("q_id"))
  }

  /** MRR table (q400): per query, the rank of the FIRST relevant
    * result in the full brute ranking and its reciprocal — one exact
    * division per row (no FP mean across queries; the per-query table
    * IS the deliverable, the q154 trajectory discipline).
    */
  def mrrTable(spark: SparkSession, dir: String): DataFrame =
    bruteRanked(corpus(spark, dir))
      .filter(col("label") === col("q_label"))
      .groupBy(col("q_id"))
      .agg(min(col("rank")).as("first_rel_rank"))
      .select(col("q_id"), col("first_rel_rank"),
        (lit(1.0) / col("first_rel_rank").cast("double"))
          .as("reciprocal_rank"))
      .orderBy(col("q_id"))

  /** NDCG@10 (q401): binary gains, DCG = Σ 1/log2(rank+1) over the
    * relevant ranks ≤ 10, IDCG = the same sum over ranks 1..min(10,
    * n_rel). Both sums fold a SORTED ≤10-element list left-to-right
    * (deterministic FP order cross-engine — the q91 left-fold rule).
    */
  def ndcgAt10(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val ranked = bruteRanked(c)
    val rel = c.groupBy(col("label").as("q_label"))
      .agg(count(lit(1)).as("n_label"))
    val dcg = ranked.filter(col("rank") <= K)
      .groupBy(col("q_id"), col("q_label"))
      .agg(aggregate(
        sort_array(collect_list(
          when(col("label") === col("q_label"), col("rank")))),
        lit(0.0),
        (acc, r) => acc + lit(1.0) / log2(r.cast("double") + 1.0))
        .as("dcg"),
        sum(when(col("label") === col("q_label"), 1L).otherwise(0L))
          .as("n_hits"))
    dcg.join(broadcast(rel), Seq("q_label"))
      .select(col("q_id"), col("q_label"), col("n_hits"), col("dcg"),
        aggregate(sequence(lit(1L),
          greatest(lit(1L), least(lit(K.toLong), col("n_label") - 1))),
          lit(0.0),
          (acc, r) => acc + lit(1.0) / log2(r.cast("double") + 1.0))
          .as("idcg"))
      .withColumn("ndcg", when(col("idcg") > 0.0,
        col("dcg") / col("idcg")).otherwise(0.0))
      .orderBy(col("q_id"))
  }

  /** IVF-vs-brute agreement (q402): the q120 4-list quantizer at
    * nprobe=2 evaluated against the brute top-10 — per query: label
    * hits through the index, overlap with the brute set, and the two
    * rates. The decision table for "is the index good enough to
    * replace the scan" at a given probe budget — on LABEL relevance,
    * complementing q253's true-NN recall sweep.
    */
  /** The ranked nprobe-IVF top-10 (q_id, q_label, vec_id, label,
    * rank) — the q402 index side, shared with the sign-test family.
    */
  private[operators] def ivfRanked(spark: SparkSession, dir: String,
      nprobe: Int = 2): DataFrame = {
    val c = corpus(spark, dir)
    // the q120 fixed quantizer: assignment for corpus, probe routing
    // for queries — same broadcast argmax arithmetic
    val model = (0 until 4).map(cc =>
      (cc.toLong, (0 until 64).map(d =>
        Similarity.mdNibbleVal(s"iv|$cc|$d")).toSeq))
    val cent = spark.createDataFrame(model).toDF("c", "w")
    def argTop(vecs: DataFrame, idCol: String, vCol: String,
        n: Int): DataFrame =
      vecs.crossJoin(broadcast(cent))
        .withColumn("s", dotNative(col(vCol), col("w")))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col(idCol))
            .orderBy(col("s").desc, col("c"))))
        .filter(col("rn") <= n)
        .select(col(idCol), col("c").as("cid"))
    val assigned = argTop(c.select(col("vec_id"), col("v")),
      "vec_id", "v", 1)
    val q = c.filter(col("vec_id") >= 1 && col("vec_id") <= NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("label").as("q_label"))
    val probes = argTop(q.select(col("q_id"), col("qv").as("v")),
      "q_id", "v", nprobe)
    val ivfTop = probes
      .join(assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(q, Seq("q_id"))
      .join(c.select(col("vec_id"), col("v"), col("label")),
        Seq("vec_id"))
      .select(col("q_id"), col("q_label"), col("vec_id"), col("label"),
        dotNative(col("qv"), col("v")).as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= K)
    ivfTop
  }

  /** IVF-vs-brute agreement (q402): the q120 4-list quantizer at
    * nprobe=2 evaluated against the brute top-10 — per query: label
    * hits through the index, overlap with the brute set, and the two
    * rates.
    */
  def ivfVsBrute(spark: SparkSession, dir: String,
      nprobe: Int = 2): DataFrame = {
    val brute = bruteRanked(corpus(spark, dir)).filter(col("rank") <= K)
      .select(col("q_id"), col("vec_id"))
    ivfRanked(spark, dir, nprobe)
      .join(brute.withColumn("in_brute", lit(1L)),
        Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"), col("q_label"))
      .agg(count(lit(1)).as("n_returned"),
        sum(when(col("label") === col("q_label"), 1L).otherwise(0L))
          .as("n_label_hits"),
        sum(coalesce(col("in_brute"), lit(0L))).as("n_brute_overlap"))
      .select(col("q_id"), col("q_label"), col("n_returned"),
        col("n_label_hits"), col("n_brute_overlap"),
        (col("n_brute_overlap").cast("double") / lit(K.toDouble))
          .as("agreement_at_10"))
      .orderBy(col("q_id"))
  }

  /** kNN-classifier confusion (q403): predict each query's label as
    * the majority label of its brute top-10 (ties to the SMALLER
    * label — the q327 determinism rule), then the (true, predicted)
    * confusion counts — the third in-engine classifier, evaluated
    * with the same exact-integer discipline as q325/q336.
    */
  def knnConfusion(spark: SparkSession, dir: String): DataFrame = {
    val ranked = bruteRanked(corpus(spark, dir))
    val votes = ranked.filter(col("rank") <= K)
      .groupBy(col("q_id"), col("q_label"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    val pred = votes.withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("n_votes").desc, col("label"))))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("q_label"),
        col("label").as("pred_label"))
    pred.groupBy(col("q_label"), col("pred_label"))
      .agg(count(lit(1)).as("n_queries"))
      .orderBy(col("q_label"), col("pred_label"))
  }
}
