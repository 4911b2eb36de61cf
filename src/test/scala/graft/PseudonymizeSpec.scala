package graft

import org.apache.spark.sql.functions._

import graft.operators.Pseudonymize

/** Pseudonymization laws (q468–q470) and the CDF-maintained view
  * (q471) checked against the ledger rather than the oracle's
  * analytic shortcut.
  */
class PseudonymizeSpec extends SparkSpec {

  test("tokens are injective and format-stable") {
    val rows = Pseudonymize.pseudonymizeCensus(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_tokens") === r.getAs[Long]("n_users")))
    // histograms coincide bucket by bucket
    Pseudonymize.tokenHistogramParity(spark, sfDir).collect().foreach {
      r =>
        assert(r.getAs[Long]("n_keys_tokenized") ===
          r.getAs[Long]("n_keys_raw"))
    }
    Caches.releaseAll(spark)
  }

  test("escrow round-trip restores per-user totals exactly") {
    val rows = Pseudonymize.escrowRoundtrip(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_events_via_token") ===
        r.getAs[Long]("n_events_raw")))
    Caches.releaseAll(spark)
  }

  test("CDF-maintained view equals a recompute over the final ledger version") {
    val viaFeed = graft.streaming.ChangeFeed
      .mvIncrementalParity(spark, sfDir).collect().map(_.toSeq)
    val want = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 37 =!= 0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy(col("source")).collect().map(_.toSeq)
    assert(viaFeed.toSeq === want.toSeq)
    Caches.releaseAll(spark)
  }
}
