package graft

import org.apache.spark.sql.functions._

import graft.streaming.{Erasure, LedgerOptimize, Provenance}

/** The ledger-head OPTIMIZE contract (q519–q520): content-preserving,
  * batch-axis-preserving, threshold-gated, and idempotent — a second
  * pass on a freshly packed head is a no-op.
  */
class LedgerOptimizeSpec extends SparkSpec {

  test("rewrite conserves content, carries the batch id, and a " +
      "second pass is a no-op") {
    val root = Erasure.registryLedgerDrained(spark, sfDir)
    val before = Provenance.committedVersions(spark, root)
    val headBefore = spark.read.parquet(before.maxBy(_._1)._3)
      .collect().map(_.toString).sorted
    val res = LedgerOptimize.maybeOptimize(spark, root, force = true)
      .getOrElse(fail("forced optimize did not run"))
    assert(res.versionCommitted == res.versionRetired + 1)
    assert(res.batchId == before.maxBy(_._1)._2)
    assert(res.rowsBefore == res.rowsAfter)
    assert(res.checksumBefore == res.checksumAfter)
    assert(res.filesAfter <= res.filesBefore)
    // content set-equal through a full re-read
    val after = Provenance.committedVersions(spark, root)
    assert(after.size == before.size + 1)
    val headAfter = spark.read.parquet(after.maxBy(_._1)._3)
      .collect().map(_.toString).sorted
    assert(headAfter.toSeq == headBefore.toSeq)
    // history untouched
    before.foreach { case (v, b, path) =>
      assert(after.exists(x => x._1 == v && x._2 == b && x._3 == path))
    }
    // AS OF the retired batch resolves to the rewrite
    assert(Provenance.ledgerAsOfBatch(spark, root, res.batchId)
      .count() == res.rowsAfter)
    // the rewrite declares itself CDF-silent: empty committed changeset
    val newHead = after.maxBy(_._1)._3
    assert(spark.read.parquet(s"$newHead/_changeset").count() == 0L)
    // idempotence: the packed head is within any sane threshold
    assert(LedgerOptimize.maybeOptimize(spark, root,
      maxFiles = res.filesAfter.toInt).isEmpty)
    graft.Caches.releaseAll(spark)
  }

  test("threshold gating: a quiet head below maxFiles is never " +
      "rewritten") {
    val root = Erasure.registryLedgerDrained(spark, sfDir)
    val n = Provenance.committedVersions(spark, root).size
    assert(LedgerOptimize.maybeOptimize(spark, root,
      maxFiles = 100000).isEmpty)
    assert(Provenance.committedVersions(spark, root).size == n)
    graft.Caches.releaseAll(spark)
  }
}
