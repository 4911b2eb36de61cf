package graft

import org.apache.spark.sql.functions._

import graft.operators.Anonymity

/** Cross-fact invariants for the k-anonymity family (q444–q446):
  * ladder monotonicity (coarser levels cannot create more classes),
  * consistency between the work list and the ladder census, and
  * l-diversity's bound by class size.
  */
class AnonymitySpec extends SparkSpec {

  test("ladder: classes shrink monotonically, level-0 census matches the work list") {
    val ladder = Anonymity.kanonGeneralize(spark, sfDir)
      .orderBy(col("level")).collect()
    assert(ladder.length === 4)
    // coarsening merges classes: n_classes non-increasing in level
    ladder.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_classes") >= b.getAs[Long]("n_classes"))
      case _ =>
    }
    // level-0 violating census == the q444 work list aggregates
    val wl = Anonymity.kanonAudit(spark, sfDir).collect()
    val l0 = ladder.head
    assert(l0.getAs[Long]("n_violating_classes") === wl.length.toLong)
    assert(l0.getAs[Long]("n_violating_rows") ===
      wl.map(_.getAs[Long]("class_size")).sum)
    wl.foreach(r => assert(r.getAs[Long]("class_size") < 5L))
    // at most one chosen level, and if chosen it has zero violations
    val chosen = ladder.filter(_.getAs[Boolean]("chosen"))
    assert(chosen.length <= 1)
    chosen.foreach(r =>
      assert(r.getAs[Long]("n_violating_classes") === 0L))
    Caches.releaseAll(spark)
  }

  test("sf0.01: the ladder reaches a releasable level") {
    val ladder = Anonymity.kanonGeneralize(spark, "/root/testdata/sf0.01")
      .collect()
    assert(ladder.exists(_.getAs[Boolean]("chosen")))
    Caches.releaseAll(spark)
  }

  test("streaming twins: drained cell state reproduces the batch ladder and l-diversity") {
    val batchLadder = Anonymity.kanonGeneralize(spark, sfDir)
      .collect().map(_.toSeq)
    val streamLadder = graft.streaming.AnonymityState
      .streamingKanonLadder(spark, sfDir).collect().map(_.toSeq)
    assert(streamLadder.toSeq === batchLadder.toSeq)
    val batchL = Anonymity.lDiversity(spark, sfDir)
      .collect().map(_.toSeq)
    val streamL = graft.streaming.AnonymityState
      .streamingLDiversity(spark, sfDir).collect().map(_.toSeq)
    assert(streamL.toSeq === batchL.toSeq)
    Caches.releaseAll(spark)
  }

  test("release census: released + suppressed rows partition the table") {
    val rel = Anonymity.kanonRelease(spark, sfDir).collect()
    val total = rel.map(r => r.getAs[Long]("n_released_rows") +
      r.getAs[Long]("n_suppressed_rows")).sum
    val customers = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(total === customers)
    // suppression is non-vacuous at fixture scale, but never total
    assert(rel.map(_.getAs[Long]("n_suppressed_rows")).sum > 0L)
    assert(rel.map(_.getAs[Long]("n_released_rows")).sum > 0L)
    Caches.releaseAll(spark)
  }

  test("l-diversity: flagged classes are homogeneous and bounded by size") {
    val rows = Anonymity.lDiversity(spark, sfDir).collect()
    assert(rows.nonEmpty) // sparse QI classes exist at fixture scale
    rows.foreach { r =>
      assert(r.getAs[Long]("l_distinct") === 1L)
      assert(r.getAs[Long]("l_distinct") <= r.getAs[Long]("class_size"))
    }
    Caches.releaseAll(spark)
  }
}
