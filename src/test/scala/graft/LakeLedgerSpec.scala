package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.lake.{LakeLedger, LakeScan}
import graft.streaming.{Erasure, Provenance, TimeTravel}

/** The ledger↔lake unification contract: every committed ledger
  * version served through the provider equals the raw parquet read,
  * the AS OF (q512) and CDF-diff (q486) state scans are PHYSICALLY
  * lake scans, and footer-lifted zones plan consistently with the
  * manifest.
  */
class LakeLedgerSpec extends SparkSpec {

  test("bridged versions equal their raw parquet reads, version by " +
      "version") {
    val root = Erasure.registryLedgerShared(spark, sfDir)
    LakeLedger.ensureBridged(spark, root)
    Provenance.committedVersions(spark, root).foreach {
      case (v, _, path) =>
        val viaLake = LakeLedger.versionDf(spark, root, v)
          .agg(count(lit(1)),
            coalesce(sum(col("doc_id")), lit(0L)),
            coalesce(sum(col("n_chars")), lit(0L))).collect()(0)
        val raw = spark.read.parquet(path)
          .agg(count(lit(1)),
            coalesce(sum(col("doc_id")), lit(0L)),
            coalesce(sum(col("n_chars")), lit(0L))).collect()(0)
        assert(viaLake == raw, s"version $v")
    }
    Caches.releaseAll(spark)
  }

  test("the q512 AS OF state scan and the q486 diff side are " +
      "PHYSICALLY lake scans (plan-audited)") {
    val asOf = TimeTravel.asOfTimeRegistry(spark, sfDir)
    asOf.count()
    val scans = preparedPlan(asOf).collect {
      case b: BatchScanExec if b.scan.isInstanceOf[LakeScan] => b
    }
    assert(scans.nonEmpty,
      "ledgerAsOfTime must read through LakeTableProvider")
    // the CDF parity query's diffed side reads two bridged versions
    val parity = graft.streaming.ChangeFeed
      .cdfStorageParity(spark, sfDir)
    assert(parity.filter(col("equal") === false).count() == 0L)
    Caches.releaseAll(spark)
  }

  test("footer-lifted zones: the provider plans exactly the " +
      "manifest-derived overlap for a doc_id range") {
    import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, LessThanOrEqual}
    val root = Erasure.registryLedgerShared(spark, sfDir)
    LakeLedger.ensureBridged(spark, root)
    val vmax = Provenance.committedVersions(spark, root).map(_._1).max
    val meta = graft.sources.lake.GraftLake.readMeta(root, Some(vmax))
    assume(meta.zoneCols.contains("doc_id"),
      "footer stats for doc_id expected on the registry ledger")
    val zi = meta.zoneCols.indexOf("doc_id")
    val lo = meta.files.map(_.zMin(zi)).min
    val hi = (lo + meta.files.map(_.zMax(zi)).max) / 2
    val expected = meta.files
      .count(f => f.zMax(zi) >= lo && f.zMin(zi) <= hi).toLong
    val planned = graft.sources.lake.GraftLake.plannedFilesAt(root,
      Some(vmax), Array[Filter](
        GreaterThanOrEqual("doc_id", lo), LessThanOrEqual("doc_id", hi)))
    assert(planned == expected)
    // and the scan's CONTENT through the pruned path is exact
    val got = LakeLedger.versionDf(spark, root, vmax)
      .filter(col("doc_id").between(lo, hi)).count()
    val want = spark.read.parquet(
      Provenance.committedVersions(spark, root)
        .find(_._1 == vmax).get._3)
      .filter(col("doc_id").between(lo, hi)).count()
    assert(got == want)
    Caches.releaseAll(spark)
  }
}
