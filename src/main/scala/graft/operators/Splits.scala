package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Split hygiene for an LLM training corpus (q360–q364): the
  * mix-planning mass report, the near-dup leakage MATRIX, the
  * leakage-safe GROUP assignment that fixes it, the migration cost of
  * adopting the fix, and the streaming mass twin.
  *
  * This family completes the existing split/decontamination surface:
  * q136 assigns the deterministic doc-hash split, and q80/q170/q245
  * MEASURE how much near-dup content leaks across it (doc-level
  * hashing cannot avoid that — near-dups hash independently). What was
  * missing is the other half of the loop: the per-split-pair leak
  * matrix on the shared edge artifact, and the standard FIX — assign
  * by near-dup component so correlated docs land in one split by
  * construction — plus what adopting the fix costs (which docs move).
  *
  * All assignment arithmetic is [[TextOps.splitCol]]'s q136 rule
  * (md5('split|' || id), first two nibbles, 204/26/26 of 256 ≈
  * 80/10/10) applied to the doc id (q360/q361) or to the component
  * label (q362) — ONE split definition across the whole library, so
  * "train" always means the same rows.
  *
  * 100 TB shape: assignment is a stateless codegen'd expression (no
  * shuffle); the leakage matrix and the group fix ride the SHARED
  * persisted dup-edge artifact ([[Dedup.dupEdges]] — built once per
  * corpus, never re-banded per report) and the q193 fixed-round
  * component labeling; every report is a #splits²-bounded aggregate.
  */
object Splits {

  /** Split-mass report (q360): per (source, split), docs and char
    * mass under the q136 rule — the table a training-mix plan is
    * drawn from (and the q364 drain).
    */
  def splitMassReport(spark: SparkSession, dir: String): DataFrame =
    massFromCells(splitCells(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))))

  /** Per-batch (source, split, kind) → cnt cells — docs and chars
    * sum-merge, so the streaming twin (q364) shares q360's oracle.
    */
  private[graft] def splitCells(docs: DataFrame): DataFrame =
    docs.select(col("source"), TextOps.splitCol("doc_id").as("split"),
        col("n_chars"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
      .select(col("source"), col("split"),
        expr("stack(2, 'docs', docs, 'chars', chars) as (kind, cnt)"))

  /** Drain/finish: pivot the cells back into the (source, split)
    * report.
    */
  private[graft] def massFromCells(cells: DataFrame): DataFrame = {
    def k(kind: String) =
      sum(when(col("kind") === kind, col("cnt")).otherwise(0L))
    cells.groupBy(col("source"), col("split"))
      .agg(k("docs").as("n_docs"), k("chars").as("n_chars_total"))
      .orderBy(col("source"), col("split"))
  }

  /** Split leakage matrix (q361): the verified near-dup pairs bucketed
    * by the split pair they straddle under the q136 doc-hash rule —
    * the FULL matrix, so same-split mass sits next to the cross-split
    * leaks. A (train, val)/(train, test) row with n_pairs > 0 is the
    * eval-inflation q245 scores per source, here broken out by WHERE
    * it lands; q362 is the fix.
    */
  def splitLeakageMatrix(spark: SparkSession, dir: String): DataFrame = {
    val e = Dedup.dupEdges(spark, dir)
      .select(col("id_a"), col("id_b"))
      .withColumn("sa", TextOps.splitCol("id_a"))
      .withColumn("sb", TextOps.splitCol("id_b"))
      .select(col("id_a"), col("id_b"),
        least(col("sa"), col("sb")).as("split_lo"),
        greatest(col("sa"), col("sb")).as("split_hi"))
      // barrier: feeds the pair counts and the distinct-doc counts
      .persist()
    graft.Caches.onRelease(() =>
      try e.unpersist(false) catch { case _: Throwable => () })
    val pairs = e.groupBy(col("split_lo"), col("split_hi"))
      .agg(count(lit(1)).as("n_pairs"))
    val docs = e.select(col("split_lo"), col("split_hi"),
        explode(array(col("id_a"), col("id_b"))).as("d"))
      .groupBy(col("split_lo"), col("split_hi"))
      .agg(countDistinct(col("d")).as("n_docs"))
    pairs.join(docs, Seq("split_lo", "split_hi"))
      .orderBy(col("split_lo"), col("split_hi"))
  }

  /** Per-doc group-safe assignment: the q193 component label (min doc
    * id of the near-dup component, singletons = self) hashed by the
    * SAME q136 rule — (doc_id, cluster, split). Shared by q362/q363.
    */
  private def groupAssigned(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
    val comp = Dedup.connectedComponents(
      Dedup.dupEdges(spark, dir)
        .select(col("id_a").as("src"), col("id_b").as("dst")),
      Some(docs.select(col("doc_id").as("id"))))
    docs.join(comp, docs("doc_id") === comp("id"))
      .select(col("doc_id"), col("source"), col("label").as("cluster"))
      .withColumn("split", TextOps.splitCol("cluster"))
  }

  /** Leakage-safe split (q362): assign by near-dup COMPONENT, so every
    * near-dup lands in one split by construction. The report carries
    * per-split doc and cluster counts plus the cross-split edge count —
    * COMPUTED from the edges, not asserted — which the group rule
    * drives to 0.
    */
  def groupSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val gs = groupAssigned(spark, dir)
      // barrier: feeds the leak join twice and the rollup
      .persist()
    graft.Caches.onRelease(() =>
      try gs.unpersist(false) catch { case _: Throwable => () })
    val leak = Dedup.dupEdges(spark, dir)
      .select(col("id_a"), col("id_b"))
      .join(gs.select(col("doc_id").as("id_a"), col("split").as("sa")),
        Seq("id_a"))
      .join(gs.select(col("doc_id").as("id_b"), col("split").as("sb")),
        Seq("id_b"))
      .filter(col("sa") =!= col("sb"))
      .agg(count(lit(1)).as("n_leak_pairs"))
    gs.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster")).as("n_clusters"))
      .crossJoin(broadcast(leak))
      .select(col("split"), col("n_docs"), col("n_clusters"),
        col("n_leak_pairs"))
      .orderBy(col("split"))
  }

  /** Split migration (q363): the doc-hash → group-safe transition
    * matrix — how many docs each (from, to) move costs, the number an
    * adoption decision weighs against the q361 leak mass. Docs in
    * singleton components never move (cluster = doc_id ⇒ same hash),
    * so the off-diagonal is exactly the near-dup membership the fix
    * re-homes.
    */
  def splitMigration(spark: SparkSession, dir: String): DataFrame =
    groupAssigned(spark, dir)
      .select(col("doc_id"), col("split").as("split_to"))
      .withColumn("split_from", TextOps.splitCol("doc_id"))
      .groupBy(col("split_from"), col("split_to"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("split_from"), col("split_to"))
}
