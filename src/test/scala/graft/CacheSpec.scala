package graft

import graft.operators.{Dedup, Similarity}

/** The cache-lifetime contract (see [[Caches]]): queries may persist
  * barrier intermediates; after the caller consumes a result,
  * `Caches.releaseAll` must leave the session with zero cached RDDs —
  * a long-lived multi-query session must not leak storage memory.
  */
class CacheSpec extends SparkSpec {

  test("Caches.releaseAll drops every persisted intermediate") {
    Dedup.minhashCandidates(spark, sfDir).count()
    Similarity.lshTopK(spark, sfDir).count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "barrier caches should exist after running the cached queries")
    Caches.releaseAll(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "releaseAll must leave no cached RDDs behind")
  }
}
