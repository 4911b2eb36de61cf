// Hosted in the org.apache.spark.sql tree solely for private[sql]
// access to the StateStore coordinator object — same rationale as
// VectorExpressions.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Streaming state-store teardown for long-lived batch+streaming
  * sessions.
  *
  * Every stateful streaming query leaves its per-partition
  * `StateStoreProvider`s loaded after termination so a restarted query
  * can reuse them — HDFS-backed providers pin deserialized state maps
  * on-heap, RocksDB providers pin native memory and block-cache pages
  * OFF-heap, and a maintenance thread keeps running. A session that
  * runs 7+ one-shot streaming queries (each with a fresh temp
  * checkpoint, so the providers can never be reused) accumulates all
  * of it for the life of the JVM.
  *
  * `StateStore.stop()` unloads every provider and stops the
  * maintenance task; it is re-entrant by design — the next streaming
  * query lazily restarts maintenance and reloads what it needs.
  */
object SessionHygiene {
  def unloadStateStores(): Unit =
    try StateStore.stop() catch { case _: Throwable => () }
}
