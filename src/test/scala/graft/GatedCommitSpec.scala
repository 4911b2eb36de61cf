package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gated-commit properties (q496–q497) beyond the oracles: the state
  * versions physically contain no violating row, the dead letters
  * only violating rows, both trails share stream positions, and the
  * split conserves every arrival.
  */
class GatedCommitSpec extends SparkSpec {

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
