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

  test("rebalance conserves the survivors and actually moves them") {
    val flows = AnnMaintenance.rebalanceCensus(spark, sfDir).collect()
    val (state, _) = AnnMaintenance.deletedIvfLedger(spark, sfDir)
    // every survivor lands in exactly one new list — nothing lost,
    // nothing invented, no deleted vector re-enters
    assert(flows.map(_.getLong(flows.head.fieldIndex("n_vectors"))).sum
      === state.count())
    assert(flows.forall { r =>
      val cn = r.getLong(r.fieldIndex("cid_new"))
      cn >= 0L && cn < 8L
    })
    // the refreshed model genuinely redistributes (a no-op rebalance
    // would keep every flow on the diagonal)
    assert(flows.exists(r => r.getLong(r.fieldIndex("cid_old"))
      != r.getLong(r.fieldIndex("cid_new"))))
  }

  test("rebalanced search keeps brute-overlap parity at equal " +
      "probed fraction") {
    val rows = AnnMaintenance.rebalanceRecallParity(spark, sfDir)
      .collect()
    assert(rows.length === 5)
    val oldSum = rows.map(r =>
      r.getLong(r.fieldIndex("n_overlap_old"))).sum
    val newSum = rows.map(r =>
      r.getLong(r.fieldIndex("n_overlap_new"))).sum
    assert(newSum > 0L && oldSum > 0L)
    // parity bar: the rebalanced index must not lose aggregate
    // agreement vs the half-empty index it replaces
    assert(newSum >= oldSum,
      s"rebalance degraded agreement: $oldSum -> $newSum")
  }
}
