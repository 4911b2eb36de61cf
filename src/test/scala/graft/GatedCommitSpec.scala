package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gated-commit properties (q496–q497) beyond the oracles: the state
  * versions physically contain no violating row, the dead letters
  * only violating rows, both trails share stream positions, and the
  * split conserves every arrival.
  */
class GatedCommitSpec extends SparkSpec {
  import spark.implicits._

  test("crash between quarantine and state commit replays losslessly") {
    // quarantine-first ordering: the dead-letter version lands, the
    // process dies before the state commit — the restarted fold must
    // re-run (state gate not set), skip the already-committed
    // quarantine (its own gate), and end with BOTH trails
    // single-versioned at the same position
    val root = java.nio.file.Files
      .createTempDirectory("graft_gate_crash_").toString
    val dead = new StreamingOps.VersionedLedger(spark, s"$root/dead",
      Some(root))
    val bad = Seq((2L, "s0", 50L)).toDF("doc_id", "source", "n_chars")
    dead.write(bad, 0L) // first attempt's quarantine, then the crash
    // restart: handles re-seed from disk
    val ledger2 = new StreamingOps.VersionedLedger(spark,
      s"$root/state", Some(root))
    val dead2 = new StreamingOps.VersionedLedger(spark, s"$root/dead",
      Some(root))
    assert(!ledger2.isReplayed(0L)) // the fold re-runs
    assert(dead2.isReplayed(0L)) // the quarantine does not double
    if (!dead2.isReplayed(0L)) dead2.write(bad, 0L)
    ledger2.write(
      Seq((1L, "s0", 200L)).toDF("doc_id", "source", "n_chars"), 0L)
    val sv = Provenance.committedVersions(spark, s"$root/state")
    val dv = Provenance.committedVersions(spark, s"$root/dead")
    assert(sv.map(v => (v._1, v._2)) === Seq((0L, 0L)))
    assert(dv.map(v => (v._1, v._2)) === Seq((0L, 0L)))
    assert(spark.read.parquet(dv.head._3).count() === 1L)
    assert(spark.read.parquet(sv.head._3).count() === 1L)
    graft.Caches.releaseAll(spark)
  }

  test("gate splits physically; positions align; conservation holds") {
    val (stateRoot, deadRoot) = GatedCommit.gatedLedger(spark, sfDir)
    val sv = Provenance.committedVersions(spark, stateRoot)
    val dv = Provenance.committedVersions(spark, deadRoot)
    // both trails carry the same stream positions
    assert(sv.map(v => (v._1, v._2)) === dv.map(v => (v._1, v._2)))
    // no violating row ever committed to state; no passing row to dead
    sv.foreach { case (_, _, p) =>
      assert(spark.read.parquet(p)
        .filter(col("n_chars") < 100).count() === 0L)
    }
    dv.foreach { case (_, _, p) =>
      assert(spark.read.parquet(p)
        .filter(col("n_chars") >= 100).count() === 0L)
    }
    // head conservation against the raw table
    val raw = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val nOk = spark.read.parquet(sv.last._3).count()
    val nBad = spark.read.parquet(dv.last._3).count()
    assert(nOk + nBad === raw)
    assert(nBad > 0L) // non-vacuous: the fixture has violations
    graft.Caches.releaseAll(spark)
  }
}
