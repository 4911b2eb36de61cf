package graft

import org.apache.spark.sql.functions._

import graft.operators.Curriculum

/** Curriculum/budget family (q394–q398): cells sum-merge (the q397
  * contract), the greedy trajectory spends exactly the budget with
  * non-increasing density, and the manifest is deterministic.
  */
class CurriculumSpec extends SparkSpec {

  test("phase cells sum-merge: two halves equal the one-shot table") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val whole = Curriculum.phasesFromCells(
      Curriculum.phaseCells(docs)).collect().toSeq
    val merged = Curriculum.phasesFromCells(
      Curriculum.phaseCells(docs.filter(col("doc_id") % 2 === 0))
        .unionByName(
          Curriculum.phaseCells(docs.filter(col("doc_id") % 2 === 1))))
      .collect().toSeq
    assert(whole == merged)
    Caches.releaseAll(spark)
  }

  test("optimizer: spends exactly the budget, density non-increasing, " +
      "marginal source partial") {
    val rows = Curriculum.curationOptimizer(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val densities = rows.map(_.getAs[Double]("density")).toSeq
    assert(densities == densities.sorted.reverse)
    val takes = rows.map(_.getAs[Long]("take_tokens")).toSeq
    assert(takes.forall(_ > 0))
    // every step but the last takes its source whole
    rows.init.foreach(r =>
      assert(r.getAs[Long]("take_tokens") === r.getAs[Long]("n_tokens")))
    // the trajectory lands exactly on the budget (total div 2 — the
    // corpus is bigger than the budget, so the last take is partial
    // or exact)
    val total = graft.sources.Tables.documents(spark, sfDir)
      .select(sum(graft.functions.TextAnalytics
        .tokenCount(col("text")).cast("long")))
      .collect()(0).getLong(0)
    assert(rows.last.getAs[Long]("cum_tokens") === total / 2)
    Caches.releaseAll(spark)
  }

  test("manifest is deterministic and offsets are consistent") {
    val a = Curriculum.curriculumManifest(spark, sfDir).collect().toSeq
    val b = Curriculum.curriculumManifest(spark, sfDir).collect().toSeq
    assert(a == b)
    // cum_tokens at pos 1 equals that row's own n_tokens
    a.filter(_.getAs[Long]("pos") == 1L).foreach(r =>
      assert(r.getAs[Long]("cum_tokens") === r.getAs[Long]("n_tokens")))
    Caches.releaseAll(spark)
  }
}
