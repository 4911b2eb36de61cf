package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Pseudonymization (q468–q470, block 56): the GDPR middle ground the
  * privacy surface was missing. Redaction (q348) destroys the
  * identifier; erasure (q386+) deletes the rows; k-anonymity
  * (q444+) coarsens them. Pseudonymization KEEPS analytical utility:
  * replace the identifier with a deterministic keyed token
  * (`md5('pk|' || user_id)` — the q253 fixed-key discipline standing
  * in for an HMAC whose key lives in an escrow service), analyze on
  * tokens exactly as on raw ids (the token is injective, so every
  * per-key aggregate is preserved), and re-identify ONLY through the
  * escrow mapping table when a lawful request demands it.
  *
  * q468 is the injectivity census (distinct tokens == distinct users
  * per event type — a token collision would silently merge two
  * users' histories); q469 the utility-preservation law (the
  * events-per-key histogram computed on tokens equals the raw one);
  * q470 the escrow round-trip (token-keyed totals joined back
  * through the mapping equal raw per-user totals row for row).
  *
  * 100 TB shape: tokenization is a codegen'd scalar in the scan
  * projection (no shuffle added); the escrow mapping is #users rows
  * (broadcast-sized per tenant); every analysis keeps its original
  * plan shape with the token as the key.
  */
object Pseudonymize {

  private def token = md5(concat(lit("pk|"),
    col("user_id").cast("string"))).as("token")

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(col("user_id"), col("event_type"))

  /** q468: per event type — events, distinct users, distinct tokens.
    * Injectivity means the last two columns are equal everywhere.
    */
  def pseudonymizeCensus(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("user_id"), col("event_type"), token)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("token")).as("n_tokens"))
      .orderBy(col("event_type"))

  /** q469: the events-per-key histogram on tokens next to the raw
    * one — utility preservation as one table.
    */
  def tokenHistogramParity(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("user_id"), token).persist()
    val viaToken = ev.groupBy(col("token"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("n_events"))
      .agg(count(lit(1)).as("n_keys_tokenized"))
    val viaRaw = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("n_events"))
      .agg(count(lit(1)).as("n_keys_raw"))
    viaToken.join(viaRaw, Seq("n_events"), "full_outer")
      .na.fill(0L, Seq("n_keys_tokenized", "n_keys_raw"))
      .orderBy(col("n_events"))
  }

  /** q470: the lawful re-identification path — totals computed in
    * token space, joined back through the escrow mapping, equal the
    * raw per-user totals.
    */
  def escrowRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("user_id"), token).persist()
    val escrow = ev.select(col("user_id"), col("token")).distinct()
    val tokenTotals = ev.groupBy(col("token"))
      .agg(count(lit(1)).as("n_events_via_token"))
    val rawTotals = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events_raw"))
    tokenTotals.join(escrow, Seq("token"))
      .join(rawTotals, Seq("user_id"))
      .select(col("user_id"), col("n_events_via_token"),
        col("n_events_raw"))
      .orderBy(col("user_id"))
  }
}
