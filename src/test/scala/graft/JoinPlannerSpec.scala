package graft

import org.apache.spark.sql.functions._

import graft.operators.JoinPlanner
import graft.streaming.LedgerArtifacts

/** The CBO loop's artifact contract (q409/q437): edge stats are
  * collected once per corpus and READ thereafter; a stale or missing
  * artifact falls back to a fresh collection; the stored rows equal a
  * fresh recompute.
  */
class JoinPlannerSpec extends SparkSpec {
  import spark.implicits._

  test("stats build once per corpus, then serve reads") {
    val before = JoinPlanner.statsBuildCount
    val first = JoinPlanner.joinStatsPlanner(spark, sfDir)
      .collect().map(_.toSeq)
    val afterFirst = JoinPlanner.statsBuildCount
    assert(afterFirst >= before) // built here or by an earlier query
    val second = JoinPlanner.joinStatsPlanner(spark, sfDir)
      .collect().map(_.toSeq)
    assert(JoinPlanner.statsBuildCount === afterFirst) // no rebuild
    assert(first.toSeq === second.toSeq)
    assert(first.length === 8)
    Caches.releaseAll(spark)
  }

  test("a stale fingerprint forces recollection and heals the artifact") {
    JoinPlanner.joinStatsPlanner(spark, sfDir).collect()
    val path = s"${LedgerArtifacts.artifactRoot}/join_stats_" +
      LedgerArtifacts.dirKey(sfDir)
    // tamper BOTH sides: a wrong fingerprint (the corpus 'changed')
    // and a doctored stats row — the rebuild must replace the rows
    Seq("stale").toDF("fingerprint").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
    spark.read.parquet(s"$path/stats")
      .withColumn("fact_rows", lit(-1L))
      .write.mode("overwrite").parquet(s"$path/stats_bad")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/stats"), true)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$path/stats_bad"),
      new org.apache.hadoop.fs.Path(s"$path/stats")))
    val builds = JoinPlanner.statsBuildCount
    val healed = JoinPlanner.joinStatsPlanner(spark, sfDir).collect()
    assert(JoinPlanner.statsBuildCount === builds + 1) // stale -> rebuilt
    assert(healed.forall(_.getAs[Long]("fact_rows") > 0L))
    Caches.releaseAll(spark)
  }
}
