package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Partition-spec evolution (q459–q460, block 52): change how a table
  * is partitioned WITHOUT rewriting history — the Iceberg move the
  * static layouts (q416's file plan, q439's zone maps) can't express.
  * Files written under the old spec keep it; files written after the
  * evolution carry the new one; the manifest records the spec per
  * file; and a reader prunes each file by ITS OWN spec's partition
  * values — coarser pruning on old files, finer on new, never a wrong
  * row.
  *
  * Fixture mapping: documents arrive in the deterministic 3-batch
  * id-range split. Batches 0–1 are written under spec 0 (partitioned
  * by `source`); the table then evolves to spec 1 (partitioned by
  * `source, lang`) and batch 2 lands under it. One partition = one
  * file (the fixture's grain; a production partition holds many
  * files — same manifest algebra, one more level).
  *
  * The scan audit (q460) drives a (source, lang) point predicate
  * through the manifest: spec-0 files can only prune on source — the
  * reader must scan every lang of the matching source written before
  * the evolution — while spec-1 files prune on both columns. The
  * read-amplification delta between the two spec generations IS the
  * business case for the evolution, quantified per batch.
  *
  * All integer/string grouping — both queries hash-oracle.
  *
  * 100 TB shape: the manifest is one metadata row per partition-file;
  * the audit joins one predicate against it (broadcast). Evolution
  * never touches written data — that is the entire point.
  */
object PartitionEvolution {

  /** documents + batch id under the 3-batch id-range split. */
  private def batched(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"))
    val mm = d.agg(min(col("doc_id")).as("lo"),
      expr("(max(doc_id) - min(doc_id) + 3L) div 3L").as("span"))
    d.crossJoin(broadcast(mm))
      .withColumn("batch_id",
        least(expr("(doc_id - lo) div span"), lit(2L)))
      .drop("lo", "span")
  }

  /** The file manifest across both specs: spec 0 (source) for
    * batches 0–1, spec 1 (source, lang) for batch 2. `part_lang` is
    * NULL for spec-0 files — the partition column did not exist when
    * they were written, exactly how an evolved table's old manifests
    * read.
    */
  private[graft] def manifest(spark: SparkSession, dir: String): DataFrame =
    batched(spark, dir)
      .withColumn("spec_id",
        when(col("batch_id") <= 1, 0L).otherwise(1L))
      .withColumn("part_source", col("source"))
      .withColumn("part_lang",
        when(col("spec_id") === 1L, col("lang")))
      .groupBy(col("batch_id"), col("spec_id"), col("part_source"),
        col("part_lang"))
      .agg(count(lit(1)).as("n_rows"))

  /** q459: the manifest itself, ordered — the spec-per-file record a
    * reader resolves before planning.
    */
  def partitionEvolutionManifest(spark: SparkSession,
      dir: String): DataFrame =
    manifest(spark, dir)
      .orderBy(col("batch_id"), col("part_source"), col("part_lang"))

  /** q460: the mixed-spec scan audit for the deterministic point
    * predicate (min source, min lang): per batch, the files/rows the
    * manifest admits vs the rows actually matching. Spec-0 batches
    * show the lang read-amplification the evolution removes.
    */
  def partitionEvolutionScan(spark: SparkSession, dir: String): DataFrame = {
    val rows = batched(spark, dir).persist()
    val probe = rows.agg(min(col("source")).as("p_source"),
      min(col("lang")).as("p_lang"))
    val admitted = manifest(spark, dir)
      .crossJoin(broadcast(probe))
      .filter(col("part_source") === col("p_source") &&
        (col("part_lang").isNull || col("part_lang") === col("p_lang")))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("files_scanned"),
        sum(col("n_rows")).as("rows_scanned"))
    val matched = rows.crossJoin(broadcast(probe))
      .filter(col("source") === col("p_source") &&
        col("lang") === col("p_lang"))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("rows_matched"))
    admitted.join(matched, Seq("batch_id"), "left")
      .na.fill(0L, Seq("rows_matched"))
      .orderBy(col("batch_id"))
  }
}
