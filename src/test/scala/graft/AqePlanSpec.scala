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

  test("bounded-sample non-equi self-joins broadcast, never CartesianProduct") {
    // a plain a.join(b, id_a < id_b) plans as CartesianProduct with
    // leftSplits×rightSplits tasks — hundreds of near-empty tasks at
    // fixture split counts; the operators promise a broadcast build of
    // the structurally-bounded side instead
    import graft.operators.Similarity
    val exact = finalPlan(Similarity.cosineNearDupExact(spark, sfDir))
    assert(!exact.contains("CartesianProduct"),
      s"q91 regressed to a cartesian plan:\n${exact.take(3000)}")
    assert(exact.contains("BroadcastNestedLoopJoin"),
      s"q91's bounded sample is not broadcast:\n${exact.take(3000)}")
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
