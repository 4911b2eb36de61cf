package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deletion vectors (q463–q465, block 54): merge-on-read deletes —
  * the third physical-delete strategy, completing the set the repo
  * already has (copy-on-write rewrite in `Erasure.erase`; full-table
  * complement in q08). A delete request writes a per-file DELETION
  * VECTOR (the deleted keys of that file) instead of rewriting the
  * file; readers scan the file and anti-join its DV. Delta/Iceberg's
  * DV/positional-delete design: a 1-in-37 takedown touches ~3% of
  * rows in EVERY file, so copy-on-write would rewrite the entire
  * corpus — DVs write kilobytes instead, and the rewrite is deferred
  * until a file's deleted fraction earns it (compaction's job, not
  * the delete path's).
  *
  * Fixture mapping: documents in 256-row files (doc_id order), the
  * q386 erasure predicate (doc_id % 37 == 0) as request 1, a second
  * request (% 41) merging into the same DVs — DV union is the
  * maintenance operation, and q465 pins that two merged requests
  * read identically to one combined predicate.
  *
  * All counts/keys integer — every query hash-oracles.
  * DeletionVectorsSpec additionally stores the DVs as parquet and
  * round-trips the read path through them (the stored-state side the
  * relational oracle can't see).
  *
  * 100 TB shape: the census/advisor read DV metadata (one row per
  * touched file); the merge-on-read scan is the scan the query ran
  * anyway plus a broadcast anti-join of the request keys; nothing
  * rewrites until the deferred compaction chooses to.
  */
object DeletionVectors {

  private val RowsPerFile = 256L

  private[graft] def filedDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rn",
        row_number().over(Window.orderBy(col("doc_id"))).cast("long"))
      .withColumn("file_id", expr(s"(rn - 1L) div ${RowsPerFile}L"))
      .drop("rn")

  private def deletedPred1 = col("doc_id") % 37 === 0
  private def deletedPred2 = col("doc_id") % 41 === 0

  /** q463: the DV census after request 1 — per touched file, size,
    * deleted count, and live remainder. The table a compaction
    * planner reads to decide which files earned a rewrite.
    */
  def dvCensus(spark: SparkSession, dir: String): DataFrame =
    filedDocs(spark, dir)
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(when(deletedPred1, 1L).otherwise(0L)), lit(0L))
          .as("n_deleted"))
      .filter(col("n_deleted") > 0L)
      .select(col("file_id"), col("n_rows"), col("n_deleted"),
        (col("n_rows") - col("n_deleted")).as("live_rows"))
      .orderBy(col("file_id"))

  /** q464: the merge-on-read parity read — scan the files, anti-join
    * each file's DV, and report the LIVE census per source. The
    * oracle recomputes it as a direct complement filter: one row of
    * difference means the DV path resurrected or over-deleted.
    */
  def dvReadParity(spark: SparkSession, dir: String): DataFrame = {
    val docs = filedDocs(spark, dir).persist()
    val dv = docs.filter(deletedPred1)
      .select(col("file_id"), col("doc_id"))
    docs.join(dv, Seq("file_id", "doc_id"), "left_anti")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"))
      .orderBy(col("source"))
  }

  /** Orders under the q439 file layout with the %37 delete request —
    * a second fixture surface for the compaction trigger, chosen
    * because its per-file deleted counts VARY (6 or 7 per 256-row
    * file), so a count threshold genuinely splits the files.
    */
  private def filedOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "orders")
      .select(col("o_orderkey"))
      .withColumn("rn",
        row_number().over(Window.orderBy(col("o_orderkey"))).cast("long"))
      .withColumn("file_id", expr(s"(rn - 1L) div ${RowsPerFile}L"))
      .drop("rn")

  /** Rewrite trigger: a file carrying this many deleted rows has
    * earned its copy-on-write rewrite; below it the DV stays.
    */
  private val RewriteAt = 7L

  /** q478: the DV compaction plan — per file, its deleted count and
    * the action (`rewrite` when the DV reached the threshold, `carry`
    * otherwise). The deferred-rewrite decision q463's census exists
    * to feed: DVs make deletes cheap, and THIS table is when the debt
    * gets paid.
    */
  def dvCompactionPlan(spark: SparkSession, dir: String): DataFrame =
    filedOrders(spark, dir)
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(when(col("o_orderkey") % 37 === 0, 1L)
          .otherwise(0L)), lit(0L)).as("n_deleted"))
      .filter(col("n_deleted") > 0L)
      .withColumn("action",
        when(col("n_deleted") >= RewriteAt, "rewrite")
          .otherwise("carry"))
      .orderBy(col("file_id"))

  /** q479: the post-compaction state — rewritten files shrink to
    * their live rows and drop their DV; carried files keep full size
    * and their DV. Total live rows are identical either way (the
    * compaction changes WHERE the delete is represented, never what
    * a reader sees) — the invariant the oracle pins per file.
    */
  def dvCompactionState(spark: SparkSession, dir: String): DataFrame =
    dvCompactionPlan(spark, dir)
      .select(col("file_id"),
        when(col("action") === "rewrite",
          col("n_rows") - col("n_deleted")).otherwise(col("n_rows"))
          .as("stored_rows"),
        when(col("action") === "rewrite", 0L).otherwise(col("n_deleted"))
          .as("dv_remaining"),
        (col("n_rows") - col("n_deleted")).as("live_rows"))
      .orderBy(col("file_id"))

  /** q505: merge-on-read TIME TRAVEL — deletes are versioned metadata,
    * so a reader pinned at DV epoch e applies exactly the vectors
    * committed by e: epoch 0 (before any request) sees everything,
    * epoch 1 applies request 1 (%37), epoch 2 the merged requests
    * (%37 ∪ %41). "Yesterday's table" includes yesterday's deletes
    * only — the composition of the q463 DV family with the q358 AS OF
    * axis, per (epoch, source) live census.
    *
    * 100 TB shape: each epoch's read is the same scan + broadcast
    * anti-join of that epoch's DV keys; the epoch pin costs metadata.
    */
  def dvAsOfCensus(spark: SparkSession, dir: String): DataFrame = {
    val docs = filedDocs(spark, dir).persist()
    def epoch(e: Long, dead: Option[org.apache.spark.sql.Column])
        : DataFrame = {
      val live = dead.map(d => docs.filter(!d)).getOrElse(docs)
      live.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .select(lit(e).as("epoch"), col("source"), col("n_docs"))
    }
    epoch(0L, None)
      .unionByName(epoch(1L, Some(deletedPred1)))
      .unionByName(epoch(2L, Some(deletedPred1 || deletedPred2)))
      .orderBy(col("epoch"), col("source"))
  }

  /** q465: DV maintenance — request 2 (% 41) merges into request 1's
    * vectors by per-file key union, and the merged census must
    * equal the one-shot census of the combined predicate (keys on
    * both requests counted once). The mergeability law that lets
    * every new takedown cost O(request), never O(existing DVs).
    */
  def dvMergeCensus(spark: SparkSession, dir: String): DataFrame = {
    val docs = filedDocs(spark, dir).persist()
    val dv1 = docs.filter(deletedPred1)
      .select(col("file_id"), col("doc_id"))
    val dv2 = docs.filter(deletedPred2)
      .select(col("file_id"), col("doc_id"))
    val merged = dv1.unionByName(dv2).distinct()
    docs.groupBy(col("file_id")).agg(count(lit(1)).as("n_rows"))
      .join(merged.groupBy(col("file_id"))
        .agg(count(lit(1)).as("n_deleted")), Seq("file_id"))
      .select(col("file_id"), col("n_rows"), col("n_deleted"),
        (col("n_rows") - col("n_deleted")).as("live_rows"))
      .orderBy(col("file_id"))
  }
}
