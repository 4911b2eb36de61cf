package graft

import graft.operators.{Dedup, TextOps}

/** Runtime-plan assertions: joins that deliberately carry NO broadcast
  * hint (because their build side is corpus-derived and only
  * runtime-small) must still END UP broadcast via AQE's post-shuffle
  * size stats — the property the operator docs promise. Asserted the
  * way BucketedSpec asserts exchange-freedom: materialize, then read
  * the finalized adaptive plan.
  */
class AqePlanSpec extends SparkSpec {

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    // collect() executes THIS df's QueryExecution (count() would build
    // a different one and leave this plan unfinalized)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("AQE broadcasts the unigram-LM vocabulary join at runtime") {
    val plan = finalPlan(TextOps.unigramLmScore(spark, sfDir))
    assert(plan.contains("isFinalPlan=true"))
    assert(plan.contains("BroadcastHashJoin"),
      s"vocabulary join did not convert to broadcast:\n${plan.take(3000)}")
    Caches.releaseAll(spark)
  }

  test("AQE broadcasts the incremental-minhash batch side at runtime") {
    val plan = finalPlan(Dedup.incrementalMinhash(spark, sfDir))
    assert(plan.contains("isFinalPlan=true"))
    assert(plan.contains("BroadcastHashJoin"),
      s"batch-side band join did not convert to broadcast:\n${plan.take(3000)}")
    Caches.releaseAll(spark)
  }
}
