package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** The simulation/production boundary for UNPARTITIONED windows (r15
  * verdict "what's wrong" #3): `Window.orderBy` with no partition is
  * a single-partition bottleneck at scale, tolerated in exactly two
  * declared classes — (a) the simulated-file layout families, where
  * the window assigns deterministic file ids for the oracle and the
  * documented production substitute is an equi-depth histogram in the
  * write path, and (b) post-aggregation rankings over bounded
  * relations (≤ #days / #sources / top-k rows), which are
  * metadata-scale by construction. This spec pins the boundary both
  * ways:
  *
  *  - source-level: every `Window.orderBy` site must live in the
  *    frozen allowlist below, at no more than its declared count — a
  *    new global window anywhere else (or an extra one sneaking into
  *    an allowed file) fails the build and forces a conscious
  *    decision;
  *  - plan-level: representative corpus-scale production operators
  *    must plan ZERO unpartitioned Window nodes.
  */
class WindowBoundarySpec extends SparkSpec {

  /** file (relative to src/main/scala/graft) -> max allowed sites.
    * Class (a): ZoneMap, DeletionVectors, BloomSkipping — simulated
    * file-id assignment. Class (b): bounded post-aggregation ranks.
    */
  private val Allowed = Map(
    "operators/ZoneMap.scala" -> 8,
    // class (a): the documents lake table's id-sort layout rank, the
    // lineitem instance's shipdate-sort layout rank, and the merge +
    // delete fixtures' id-sort base layouts — each runs ONCE per
    // corpus at table build (not per query), the same exact-rank
    // file-cut machinery as ZoneMap, on a narrow projection
    "sources/lake/GraftLake.scala" -> 4,
    // class (a): the concurrent OPTIMIZE's exact-rank re-cluster of
    // the snapshot it folds, and MERGE's key-sorted re-file of the
    // touched rows — maintenance commits, not query paths
    "sources/lake/LakeWrite.scala" -> 2,
    "operators/DeletionVectors.scala" -> 2,
    "operators/BloomSkipping.scala" -> 1,
    "operators/Analytics.scala" -> 1,
    "operators/TextOps.scala" -> 7,
    "operators/Sessionize.scala" -> 2,
    "operators/Lifecycle.scala" -> 1,
    "operators/Curriculum.scala" -> 1,
    "streaming/StreamingOps.scala" -> 2)

  test("every Window.orderBy site is inside the declared allowlist") {
    val root = Paths.get("src/main/scala/graft")
    val offenders = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p =>
        val rel = root.relativize(p).toString
        val n = "Window\\.orderBy".r
          .findAllIn(new String(Files.readAllBytes(p), "UTF-8")).length
        if (n == 0) None
        else if (!Allowed.contains(rel)) Some(s"$rel: $n undeclared")
        else if (n > Allowed(rel))
          Some(s"$rel: $n sites > ${Allowed(rel)} allowed")
        else None
      }.toSeq
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("corpus-scale production operators plan no global window") {
    val qs = Seq(
      "q05_semi" -> operators.Relational.semiJoin(spark, sfDir),
      "q09_topk" -> operators.Relational.topK(spark, sfDir),
      "q26_dedup" -> operators.TextOps.fingerprintDedup(spark, sfDir),
      "q409_planner" ->
        operators.JoinPlanner.joinStatsPlanner(spark, sfDir),
      "q487_optimize_audit" ->
        operators.Optimize.optimizeAudit(spark, sfDir))
    // the OPTIMIZE audit reads zone maps built by the simulated file
    // assignment — the ONE declared exception in this list, asserted
    // separately so the others stay at zero
    qs.foreach { case (name, df) =>
      val globals = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      if (name.startsWith("q487"))
        assert(globals.nonEmpty) // the simulation machinery, declared
      else
        assert(globals.isEmpty,
          s"$name plans ${globals.length} unpartitioned window(s)")
    }
    Caches.releaseAll(spark)
  }
}
