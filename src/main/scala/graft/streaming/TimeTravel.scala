package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Governance

/** Unified time travel, composed with governance (q494–q495,
  * block 71): the r15 verdict's "AS OF version/batch across every
  * ledger, composed with RLS/masking". [[Provenance.ledgerAsOf]] /
  * [[Provenance.ledgerAsOfBatch]] are the two axes (a pinned version
  * number; a stream position, resolving to the highest version whose
  * source batch is ≤ it), working against ANY `b<v>_<batch>` ledger
  * root; these queries prove the axes compose with the q472/q473
  * governance layer — the read a tenant actually issues: "the
  * balances as of yesterday's version, as analyst_eu sees them".
  *
  * q494: the OCC balance ledger (q442's customer-grain state) AS OF
  * version 1 — writer A's +7 committed, writer B's +11 not yet —
  * released to `analyst_eu`: RLS keeps regions 0–1 only (broadcast
  * grant semi-join), the customer key is masked to the deterministic
  * `md5('nm|'||key)` token (the q468/q473 discipline, so joins
  * within the release still work), balances clear. One row of B's
  * increment leaking into the v1 read, one out-of-grant region, or
  * one unmasked key breaks the oracle hash.
  *
  * q495: the registry ledger AS OF BATCH 1 — "the corpus as of
  * stream position 1" — per-source counts over exactly batches 0–1
  * of the deterministic split.
  *
  * 100 TB shape: AS OF is a version-pinned read (no extra scan);
  * RLS/masking add one broadcast semi-join and scalar projections to
  * the plan the query already had. Nothing is copied per tenant or
  * per version.
  */
object TimeTravel {

  /** q494: version-pinned + RLS + masking, row grain. */
  def asOfGovernedBalances(spark: SparkSession, dir: String): DataFrame = {
    val (_, root) = Occ.scheduleShared(spark, dir)
    val v1 = Provenance.ledgerAsOf(spark, root, 1L)
    v1.join(Governance.customerRegions(spark, dir), Seq("c_custkey"))
      .join(broadcast(Governance.grantedRegions(spark, "analyst_eu")),
        Seq("region"))
      .select(
        md5(concat(lit("nm|"), col("c_custkey").cast("string")))
          .as("name_token"),
        col("region"), col("n_orders"))
      .orderBy(col("name_token"))
  }

  /** q495: batch-pinned read of the registry ledger, per source. */
  def asOfBatchRegistry(spark: SparkSession, dir: String): DataFrame = {
    val root = Erasure.registryLedgerShared(spark, dir)
    Provenance.ledgerAsOfBatch(spark, root, 1L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy(col("source"))
  }
}
