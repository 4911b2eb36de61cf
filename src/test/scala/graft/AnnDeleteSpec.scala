package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The ANN delete contract (r13 verdict #3's "done" bar): deleted
  * vectors leave the STORED lists (compaction, not a read filter), a
  * later search can't return them, and late/replayed arrivals don't
  * resurrect them.
  */
class AnnDeleteSpec extends SparkSpec {
  import spark.implicits._

  test("delete compacts the stored version — tombstoned ids are gone " +
      "from the parquet itself") {
    val (state, ledgerRoot) =
      AnnMaintenance.deletedIvfLedger(spark, sfDir)
    // the latest committed version ON DISK holds no deleted id
    val (_, _, path) =
      Provenance.committedVersions(spark, ledgerRoot).last
    val onDisk = spark.read.parquet(path)
    assert(onDisk.filter(col("vec_id") % 37 === 0).count() === 0L)
    // and it IS the drained state (read path = stored version)
    assert(onDisk.count() === state.count())
    // non-vacuous: the corpus has deleted vectors and retained ones
    val total = graft.sources.Tables.embeddings(spark, sfDir).count()
    assert(onDisk.count() < total)
    assert(onDisk.count() > 0L)
  }

  test("late arrival of a deleted vector is dropped by the tombstones") {
    val (_, ledgerRoot) = AnnMaintenance.deletedIvfLedger(spark, sfDir)
    // a 'late' batch containing one deleted id and one fresh id,
    // folded the way the pipeline folds (tombstone filter first)
    val late = Seq((0L, 2L, 0.5), (999999L, 2L, 0.5))
      .toDF("vec_id", "cid", "score")
    val filtered =
      Erasure.applyTombstones(spark, ledgerRoot, late, keyCol = "vec_id")
    assert(filtered.select("vec_id").as[Long].collect().toSet ===
      Set(999999L))
  }

  test("post-delete search returns no deleted neighbor") {
    val res = AnnMaintenance.deleteThenQuery(spark, sfDir)
    assert(res.filter(col("neighbor") % 37 === 0).count() === 0L)
    assert(res.count() > 0L)
  }
}
