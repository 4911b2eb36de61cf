package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Row-level security + column masking (q472–q473, block 58): the
  * query-time governance layer. Erasure/anonymity/pseudonymization
  * change what is STORED; a multi-tenant engine also has to change
  * what each principal SEES of the same stored table — drop rows
  * outside the role's grant (RLS) and mask columns the role may not
  * read, without forking the data per role.
  *
  * Fixture policy (a VALUES table, the production analogue being a
  * governance catalog): `analyst_eu` sees regions 0–1 with customer
  * names masked; `analyst_na` sees region 2, names clear, balances
  * masked; `admin` sees everything clear. q472 is the per-role
  * audit (rows visible, cells masked, visible balance mass in exact
  * cents); q473 the masked release itself for `analyst_eu` at row
  * grain — the artifact a tenant actually receives, with the name
  * replaced by a deterministic `md5('nm|'||custkey)` token (so
  * joins within the release still work — the q468 pseudonym
  * discipline applied at read time).
  *
  * 100 TB shape: RLS is a broadcast semi-join of the grant table
  * into the scan filter; masks are scalar projections — the plan the
  * user's query had, plus one predicate and some CASEs. No per-role
  * copies, no second pipeline.
  */
object Governance {

  /** The region grants of one role — the RLS predicate other layers
    * (the q494 time-travel composition) broadcast into their scans.
    */
  private[graft] def grantedRegions(spark: SparkSession,
      role: String): DataFrame =
    policy(spark).filter(col("role") === role).select(col("region"))

  /** Customer → region mapping (shared with the q494 composition). */
  private[graft] def customerRegions(spark: SparkSession,
      dir: String): DataFrame =
    customers(spark, dir).select(col("c_custkey"), col("region"))

  /** (role, region grant, mask flags) — the policy catalog. */
  private def policy(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("analyst_eu", 0L, true, false),
      ("analyst_eu", 1L, true, false),
      ("analyst_na", 2L, false, true),
      ("admin", 0L, false, false),
      ("admin", 1L, false, false),
      ("admin", 2L, false, false),
      ("admin", 3L, false, false),
      ("admin", 4L, false, false))
      .toDF("role", "region", "mask_name", "mask_balance")
  }

  private def customers(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "customer")
      .join(Tables.read(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"),
        col("n_regionkey").cast("long").as("region"),
        col("c_acctbal"))

  /** q472: the per-role visibility/masking audit. Balance mass in
    * exact cents (`round(bal·100)` summed as long integers) so the row
    * hashes engine-portably.
    */
  def rlsMaskAudit(spark: SparkSession, dir: String): DataFrame =
    customers(spark, dir)
      .join(broadcast(policy(spark)), Seq("region"))
      .groupBy(col("role"))
      .agg(count(lit(1)).as("n_visible"),
        coalesce(sum(when(col("mask_name"), 1L).otherwise(0L)), lit(0L))
          .as("n_names_masked"),
        coalesce(sum(when(col("mask_balance"), 1L).otherwise(0L)),
          lit(0L)).as("n_balances_masked"),
        coalesce(sum(when(!col("mask_balance"),
          round(col("c_acctbal") * 100).cast("long")).otherwise(0L)),
          lit(0L)).as("visible_balance_cents"))
      .orderBy(col("role"))

  /** q473: the masked release for `analyst_eu` — regions 0–1 only,
    * names tokenized, balances clear (in cents).
    */
  def maskedRelease(spark: SparkSession, dir: String): DataFrame =
    customers(spark, dir)
      .join(broadcast(policy(spark)
        .filter(col("role") === "analyst_eu")
        .select(col("region"))), Seq("region"))
      .select(col("c_custkey"),
        md5(concat(lit("nm|"), col("c_custkey").cast("string")))
          .as("name_token"),
        col("region"),
        round(col("c_acctbal") * 100).cast("long").as("acctbal_cents"))
      .orderBy(col("c_custkey"))

  /** The release for ANY role, its policy applied column by column:
    * RLS from the role's region grants, the name tokenized where
    * `mask_name`, the balance REDACTED TO NULL where `mask_balance`
    * (a redaction exports as absence, not a sentinel — concat-based
    * checksums skip it identically in both engines). The per-tenant
    * generalization of [[maskedRelease]] that q518's bundles export.
    */
  private[graft] def releaseFor(spark: SparkSession, dir: String,
      role: String): DataFrame =
    customers(spark, dir)
      .join(broadcast(policy(spark).filter(col("role") === role)),
        Seq("region"))
      .select(col("c_custkey"),
        when(col("mask_name"),
          md5(concat(lit("nm|"), col("c_custkey").cast("string"))))
          .otherwise(col("c_name")).as("name_out"),
        col("region"),
        when(col("mask_balance"), lit(null).cast("long"))
          .otherwise(round(col("c_acctbal") * 100).cast("long"))
          .as("acctbal_cents"))
      .orderBy(col("c_custkey"))
}
