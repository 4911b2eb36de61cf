package graft

import graft.operators.{Dedup, Similarity}
import graft.streaming.StreamingOps

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

  test("releaseAll reclaims localCheckpoint blocks and temp spool dirs") {
    import scala.jdk.CollectionConverters._
    def graftTmpDirs: Set[String] = java.nio.file.Files
      .list(java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir", "/tmp")))
      .iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("graft_")).toSet
    val before = graftTmpDirs
    // residue-heavy paths: connected components (raw localCheckpoint
    // persists, invisible to the SQL cache), a streaming query (temp
    // delta-sink dir + loaded state-store providers), and the format
    // round-trip (tracked ORC/CSV artifact dir)
    Dedup.dupClusters(spark, sfDir).count()
    StreamingOps.hourlyWindowCounts(spark, sfDir).count()
    graft.sources.Formats.formatRoundtrip(spark, sfDir).count()
    assert(graftTmpDirs.size > before.size,
      "the streaming query should have spooled a temp sink dir")
    Caches.releaseAll(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "raw RDD persists (localCheckpoint blocks) must be freed")
    assert(graftTmpDirs.subsetOf(before),
      s"temp dirs not swept: ${(graftTmpDirs -- before).mkString(", ")}")
  }
}
