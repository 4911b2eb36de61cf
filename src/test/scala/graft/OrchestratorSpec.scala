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
}
