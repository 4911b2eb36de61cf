package graft

import org.apache.spark.sql.functions._

import graft.streaming.ChangeFeed

/** Consumer-side guarantees of the change data feed (q452–q454): the
  * replay reconstructs the ledger's final version EXACTLY (checked
  * against the ledger, not the oracle's analytic shortcut), and feed
  * rows partition by change type with no key repeated within one
  * version step.
  */
class ChangeFeedSpec extends SparkSpec {

  test("feed: no key changes twice in one version step; types partition") {
    val feed = ChangeFeed.registryChangeFeed(spark, sfDir).persist()
    val dupKeys = feed.groupBy(col("version_to"), col("doc_id"))
      .count().filter(col("count") > 1).count()
    assert(dupKeys === 0L)
    val types = feed.select(col("change_type")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(types === Set("insert", "delete"))
    // append versions emit only inserts; the erasure version only deletes
    val byVer = feed.groupBy(col("version_to"))
      .agg(collect_set(col("change_type")).as("ts")).collect()
      .map(r => r.getAs[Long]("version_to") ->
        r.getAs[Seq[String]]("ts").toSet).toMap
    assert(byVer(1L) === Set("insert"))
    assert(byVer(2L) === Set("insert"))
    assert(byVer(3L) === Set("delete"))
    feed.unpersist()
    Caches.releaseAll(spark)
  }

  test("occ feed: updates only, deltas are exactly +7 and +11") {
    val feed = ChangeFeed.occChangeFeed(spark, sfDir).collect()
    assert(feed.nonEmpty)
    feed.foreach { r =>
      assert(r.getAs[String]("change_type") === "update")
      val delta = r.getAs[Long]("new_val") - r.getAs[Long]("old_val")
      val want = if (r.getAs[Long]("version_to") == 1L) 7L else 11L
      assert(delta === want)
    }
    Caches.releaseAll(spark)
  }

  test("feed is served from stored change sets, not diffs") {
    // a PRIVATE ledger copy with one version's changeset FORGED: the
    // feed must follow the metadata (proving it never diffs when a
    // changeset is committed), and q486's parity is what would catch
    // the forgery in production
    val root: String =
      graft.streaming.Erasure.registryLedgerDrained(spark, sfDir)
    val versions = graft.streaming.Provenance
      .committedVersions(spark, root)
    val v1 = versions.find(_._1 == 1L).get._3
    val forged = spark.read.parquet(s"$v1/_changeset").limit(3)
      .withColumn("source", lit("forged_source"))
    forged.write.mode("overwrite").parquet(s"$v1/_changeset_new")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$v1/_changeset"), true)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$v1/_changeset_new"),
      new org.apache.hadoop.fs.Path(s"$v1/_changeset")))
    val feed = graft.streaming.ChangeFeed
      .feedFromRegistry(spark, root)
      .filter(col("version_to") === 1L).collect()
    assert(feed.length === 3) // the forged count, not the diff's
    assert(feed.forall(_.getAs[String]("source") == "forged_source"))
    Caches.releaseAll(spark)
  }

  test("net change set bootstraps a consumer to the exact head") {
    val net = ChangeFeed.cdfNetChanges(spark, sfDir).persist()
    // apply the net set to the v0 snapshot: one anti-join + one union
    val root: String =
      graft.streaming.Erasure.registryLedgerShared(spark, sfDir)
    val v0 = spark.read.parquet(graft.streaming.Provenance
        .committedVersions(spark, root).head._3)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val dels = net.filter(col("change_type") === "delete")
      .select(col("doc_id"))
    val ins = net.filter(col("change_type") === "insert")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val boot = v0.join(dels, Seq("doc_id"), "left_anti")
      .unionByName(ins)
      .orderBy(col("doc_id")).collect().map(_.toSeq)
    val want = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 37 =!= 0)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id")).collect().map(_.toSeq)
    assert(boot.toSeq === want.toSeq)
    net.unpersist()
    Caches.releaseAll(spark)
  }

  test("replay reconstructs the ledger's final version exactly") {
    val replayed = ChangeFeed.changeFeedReplay(spark, sfDir)
      .collect().map(_.toSeq)
    // independent final-state read: every doc except the erased set
    val want = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 37 =!= 0)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id")).collect().map(_.toSeq)
    assert(replayed.length === want.length)
    assert(replayed.toSeq === want.toSeq)
    Caches.releaseAll(spark)
  }
}
