package graft

import org.apache.spark.sql.functions._

import graft.operators.Audit

/** Data-contract family (q376–q380): planted nulls are counted, the
  * gate's severity split is exact (the fixture carries exactly three
  * warn-grade findings and zero error-grade ones), and the
  * completeness cells sum-merge (the q379 contract).
  */
class ContractsSpec extends SparkSpec {

  test("planted nulls are counted per column") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (None, None)).toDF("k", "v")
    val got = Audit.completenessCellsOf("t", df).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(("k", 3L, 1L), ("v", 3L, 2L)), got.toString)
    Caches.releaseAll(spark)
  }

  test("gate: fixture passes on errors, carries exactly the 3 warn findings") {
    val g = Audit.contractGate(spark, sfDir).collect()(0)
    assert(g.getLong(0) == 70L, s"n_rules ${g.getLong(0)}") // 51+10+9
    assert(g.getLong(1) == 0L, s"error violations ${g.getLong(1)}")
    // lineitem composite-key dups + r08 negative balances + r09 short
    // docs — all real fixture facts
    assert(g.getLong(2) == 3L, s"warn violations ${g.getLong(2)}")
    assert(g.getString(3) == "PASS")
    Caches.releaseAll(spark)
  }

  test("lineitem's declared composite key genuinely fails (warn-grade)") {
    val byTbl = Audit.keyUniqueness(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getString(2), r.getAs[Long]("n_dup_keys"))).toMap
    assert(byTbl("lineitem")._1 == "warn" && byTbl("lineitem")._2 > 0,
      byTbl.toString)
    assert(byTbl.filter(_._1 != "lineitem").values
      .forall { case (_, d) => d == 0L }, byTbl.toString)
    Caches.releaseAll(spark)
  }

  test("completeness cells sum-merge: two halves equal the one-shot audit") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val whole = Audit.completenessFromCells(
      Audit.docCompletenessCells(docs)).collect().toSeq
    val merged = Audit.completenessFromCells(
      Audit.docCompletenessCells(docs.filter(col("doc_id") % 2 === 0))
        .unionByName(Audit.docCompletenessCells(
          docs.filter(col("doc_id") % 2 === 1)))).collect().toSeq
    assert(whole == merged)
    Caches.releaseAll(spark)
  }

  test("streaming gate over a genuine 3-batch split equals the batch gate") {
    val streamDir = graft.streaming.StreamingOps.idRangeSplitSource(
      spark, graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars")), 3)
    val streamed = graft.streaming.StreamingOps.streamingContractGate(
      spark, sfDir, sourceDir = Some(streamDir),
      sourceGlob = "*.parquet", maxFilesPerTrigger = Some(1))
      .collect().toSeq
    val batch = Audit.contractGate(spark, sfDir).collect().toSeq
    assert(streamed == batch)
    Caches.releaseAll(spark)
  }

  test("key facet catches a cross-batch duplicate the per-batch view misses") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars")).limit(50)
    // the same doc arrives in two different micro-batches: each batch
    // alone is dup-free, the sum-merged key state is not
    val b0 = Audit.docKeyCells(docs)
    val b1 = Audit.docKeyCells(docs.filter(col("doc_id") < 5))
    val mergedState = b0.unionByName(b1)
      .groupBy(col("doc_id")).agg(sum(col("cnt")).as("cnt"))
    val row = Audit.docKeyRowFromCells(mergedState).collect()(0)
    assert(row.getAs[Long]("n_dup_keys") === 5L)
    assert(row.getAs[Long]("n_keys") === 50L)
    Caches.releaseAll(spark)
  }
}
