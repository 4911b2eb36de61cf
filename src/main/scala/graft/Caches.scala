package graft

import org.apache.spark.sql.SparkSession

/** Cache-lifetime contract for the registered queries.
  *
  * A few operators `persist()` small intermediates as materialization
  * barriers (shingle tables, normalized vectors — see
  * `operators/Dedup.scala`, `operators/Similarity.scala`): without the
  * barrier, Catalyst's project-collapse re-inlines the expensive
  * expression into every branch of a self-join. Those caches are
  * deliberately NOT unpersisted inside the query — the returned
  * DataFrame is lazy, and dropping the cache before the caller consumes
  * it would defeat the barrier (identical logical plans also share one
  * cache entry across queries, which the harness exploits).
  *
  * The contract is therefore: consume the result, then call
  * [[releaseAll]]. `Verify` and `Bench` do this between queries; any
  * long-lived session embedding the library should do the same.
  */
object Caches {
  /** Drop every cached plan created by registered queries (blocking),
    * returning the executor storage pool to zero.
    */
  def releaseAll(spark: SparkSession): Unit =
    spark.catalog.clearCache()
}
