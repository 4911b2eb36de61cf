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

  /** q512: the WALL-CLOCK axis (block 84, r16 verdict #3) — "the
    * corpus as of 01:30" against the registry ledger, whose three
    * versions committed at 00:00/01:00/02:00 on the fixture clock:
    * the read resolves to the 01:00 version (batches 0–1), and the
    * asked-for instant needs no knowledge of version numbers or
    * stream positions — the form a user actually asks in.
    */
  def asOfTimeRegistry(spark: SparkSession, dir: String): DataFrame = {
    val root = Erasure.registryLedgerShared(spark, dir)
    Provenance.ledgerAsOfTime(spark, root,
      Provenance.CommitClock.EpochMs + 90L * 60L * 1000L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy(col("source"))
  }

  /** q513: the tie-break, composed with governance — every version of
    * the OCC balance ledger commits within one fixture-clock tick
    * (batch 0), so "as of that instant" must resolve to the HIGHEST
    * version (the serial A-then-B end state: a coarse clock cannot
    * reorder commits), released to analyst_eu under RLS + masking.
    * One row answering from v0 or v1 instead of v2 breaks the hash.
    */
  def asOfTimeGovernedBalances(spark: SparkSession,
      dir: String): DataFrame = {
    val (_, root) = Occ.scheduleShared(spark, dir)
    val head = Provenance.ledgerAsOfTime(spark, root,
      Provenance.CommitClock.EpochMs)
    head.join(Governance.customerRegions(spark, dir), Seq("c_custkey"))
      .join(broadcast(Governance.grantedRegions(spark, "analyst_eu")),
        Seq("region"))
      .select(
        md5(concat(lit("nm|"), col("c_custkey").cast("string")))
          .as("name_token"),
        col("region"), col("n_orders"))
      .orderBy(col("name_token"))
  }
}
