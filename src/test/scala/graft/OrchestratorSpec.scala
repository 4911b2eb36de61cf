package graft.streaming

import graft.SparkSpec

/** The one-request orchestrator's contract (q430): the full cascade —
  * three tombstone-first ledger erasures, the incremental artifact
  * maintenance, both derived-view retractions — is idempotent (a
  * retried data-subject request must certify identically, never
  * double-erase), and the certificate's conservation column holds on
  * every surface.
  */
class OrchestratorSpec extends SparkSpec {

  test("the full cascade is idempotent and conserves every surface") {
    val first = ErasureOrchestrator.certificate(spark, sfDir).collect()
    assert(first.length == 6)
    assert(first.forall(_.getBoolean(first.head.fieldIndex("conserved"))),
      s"unconserved surface in ${first.mkString("; ")}")
    // the subject must exist on the fixture (non-vacuous request)
    assert(first.exists(r =>
      r.getLong(r.fieldIndex("n_erased")) > 0L))
    // second run: every ledger erase re-executes against fresh probe
    // state, the artifact leg re-reads its committed build — identical
    // certificate
    val second = ErasureOrchestrator.certificate(spark, sfDir).collect()
    assert(first.map(_.toString).toSeq == second.map(_.toString).toSeq)
  }

  test("the census artifact equals a cold re-derivation from raw") {
    import org.apache.spark.sql.functions._
    import graft.sources.Tables
    val census = ErasureOrchestrator.censusArtifact(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def split(df: org.apache.spark.sql.DataFrame,
        key: String): (Long, Long) = {
      val r = df.agg(
        sum(when(col(key) % 97 =!= 0, 1L).otherwise(0L)),
        count(lit(1))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    assert(census("documents") ==
      split(Tables.documents(spark, sfDir), "doc_id"))
    assert(census("events") ==
      split(Tables.events(spark, sfDir), "user_id"))
    assert(census("ann_lists") ==
      split(Tables.embeddings(spark, sfDir), "vec_id"))
    // view grains: retained pricing cells / brand pairs recomputed raw
    val li = Tables.lineitem(spark, sfDir)
    val retainedLi = li.join(
      Tables.orders(spark, sfDir).filter(col("o_custkey") % 97 === 0)
        .select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_anti")
    val pr = retainedLi
      .agg(countDistinct(col("l_returnflag"), col("l_linestatus")))
      .collect()(0).getLong(0)
    val pa = li
      .agg(countDistinct(col("l_returnflag"), col("l_linestatus")))
      .collect()(0).getLong(0)
    assert(census("pricing_cells") == ((pr, pa)))
    graft.Caches.releaseAll(spark)
  }
}
