package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalytics
import graft.sources.Tables

/** Dataset card (q422): the one-table datasheet a corpus RELEASE
  * ships — volume, vocabulary spread, split masses, exact-duplicate
  * mass, quality acceptance, PII incidence, and benchmark
  * contamination, each fact the exact arithmetic of its home family
  * (q28 exact-dup rule, q24 quality flag, q345 planted detectors,
  * q136 split rule, q412 window contamination) composed into ONE
  * consistent snapshot — the "Datasheets for Datasets" summary, and
  * the same reason q211's scorecard exists at source grain: numbers
  * a release page juxtaposes must come from one snapshot.
  *
  * 100 TB shape: each fact is one map-side-combined corpus aggregate
  * (the contamination fact rides the window machinery, hashes only);
  * the card is a union of one-row frames.
  */
object DatasetCard {

  private def fact(name: String, value: org.apache.spark.sql.Column,
      of: DataFrame): DataFrame =
    of.agg(value.cast("long").as("value"))
      .select(lit(name).as("fact"), col("value"))

  /** The snapshot-parameterized card facts — volume, vocabulary
    * spread, quality acceptance, exact-dup mass, split masses — over a
    * caller-persisted (doc_id, text, lang, source, n_chars) frame.
    * Shared by the release card (q422) and the release DIFF (q438).
    */
  private def cardFactsOf(docs: DataFrame): DataFrame = {
    val toks = TextAnalytics.tokens(col("text"))
    val base = Seq(
      fact("n_docs", count(lit(1)), docs),
      fact("n_tokens", sum(size(toks)), docs),
      fact("n_chars", sum(col("n_chars")), docs),
      fact("n_sources", countDistinct(col("source")), docs),
      fact("n_langs", countDistinct(col("lang")), docs),
      fact("n_quality_pass",
        sum(TextAnalytics.qualityFlag(col("text"))), docs))
    // q28 exact-dup mass: docs whose content hash appears ≥ 2 times
    val dupDocs = docs
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(count(lit(1)).as("cnt"))
      .agg(coalesce(sum(when(col("cnt") > 1, col("cnt"))
        .otherwise(0L)), lit(0L)).cast("long").as("value"))
      .select(lit("n_exact_dup_docs").as("fact"), col("value"))
    // q136 split masses
    val splits = docs
      .withColumn("split", TextOps.splitCol("doc_id"))
      .groupBy(col("split")).agg(count(lit(1)).as("value"))
      .select(concat(lit("n_split_"), col("split")).as("fact"),
        col("value"))
    base.reduce(_.unionByName(_))
      .unionByName(dupDocs)
      .unionByName(splits)
  }

  private def persisted(docs: DataFrame): DataFrame = {
    // barrier: every textual fact reads the same projection
    val p = docs.select(col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars")).persist()
    graft.Caches.onRelease(() =>
      try p.unpersist(false) catch { case _: Throwable => () })
    p
  }

  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    val docs = persisted(Tables.documents(spark, dir))
    // q345 planted-detector incidence (the PII family's corpus)
    val pii = Pii.incidenceFromCells(Pii.piiCellsOf(docs))
      .agg(sum(col("n_docs_pii")).cast("long").as("value"))
      .select(lit("n_pii_docs").as("fact"), col("value"))
    // q412 contamination: train docs sharing a test window
    val contam = Contamination.contaminationMatrix(spark, dir)
      .agg(sum(col("n_contaminated")).cast("long").as("value"))
      .select(lit("n_contaminated_train").as("fact"), col("value"))
    cardFactsOf(docs)
      .unionByName(pii)
      .unionByName(contam)
      .orderBy(col("fact"))
  }

  /** Dataset card diff (q438): the release-to-release changelog — the
    * card facts at the PREVIOUS corpus snapshot (the first two batches
    * of the deterministic 3-batch id-range split: exactly the content
    * of ledger version 1, by q388's prefix proof) joined against the
    * CURRENT snapshot, with the delta per fact. The page a release
    * review reads next to the q422 card: what changed since the last
    * cut, in the same exact arithmetic.
    *
    * 100 TB shape: two card passes (each one map-side-combined
    * aggregate per fact) + a #facts-row join — the diff never
    * re-reads either snapshot beyond what the card itself costs.
    */
  def datasetCardDiff(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.documents(spark, dir)
    val mm = all.agg(min(col("doc_id")).as("lo"),
      max(col("doc_id")).as("hi"))
    val prev = persisted(all.crossJoin(broadcast(mm))
      .withColumn("b", expr("(doc_id - lo) div ((hi - lo + 3) div 3)"))
      .filter(col("b") <= 1))
    val curr = persisted(all)
    cardFactsOf(prev).withColumnRenamed("value", "value_prev")
      .join(cardFactsOf(curr).withColumnRenamed("value", "value_curr"),
        Seq("fact"), "full")
      .select(col("fact"),
        coalesce(col("value_prev"), lit(0L)).as("value_prev"),
        coalesce(col("value_curr"), lit(0L)).as("value_curr"),
        (coalesce(col("value_curr"), lit(0L)) -
          coalesce(col("value_prev"), lit(0L))).as("delta"))
      .orderBy(col("fact"))
  }
}
