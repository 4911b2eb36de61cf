package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change data feed over versioned ledgers (q452–q454, block 49):
  * the Delta-CDF-shaped read — turn a ledger's version trail into
  * typed change rows (insert / update / delete, with old and new
  * values) that a downstream consumer can apply incrementally instead
  * of re-reading snapshots. The derived views this repo maintains
  * (q410/q411 retractable aggregates, the ANN lists, the dup-edge
  * artifact) all update from exactly this shape; this family makes
  * the feed itself a first-class, oracled query.
  *
  * The feed is served from the STORED per-commit change sets (every
  * registry-ledger commit — drain folds and the erasure rewrite —
  * writes its typed change rows as `_changeset` inside the version
  * dir, committed atomically by the stage+rename; the OCC commits do
  * the same): reading the feed costs ≤ #versions metadata files,
  * never a state diff. The adjacent-version DIFF survives as the
  * fallback for versions committed without a change set (legacy
  * trails) and as the q486 parity audit that certifies the stored
  * sets faithful — the same stored-vs-diffed split q457 pins for the
  * OCC ledger. Feed semantics start AFTER the initial snapshot
  * (v0 is read as a snapshot, not emitted as inserts) — the Delta
  * `readChangeFeed` convention.
  *
  * Probe ledgers: the q387 registry ledger (3 append batches + the
  * erasure rewrite → inserts at v1/v2, deletes at v3) and the q442
  * OCC balance ledger (two committed writers → updates with old/new
  * at v1/v2). q454 closes the loop: REPLAYING the feed against the
  * v0 snapshot must reconstruct the final version exactly — the
  * consumer-side guarantee that makes a CDF trustworthy.
  *
  * Reference anchor: the reference's insert-vs-update split
  * (`saveToPostgres.js` ON CONFLICT branches) is a change feed
  * computed row-by-row at write time; here it is recovered from the
  * version trail after the fact, for every consumer at once.
  *
  * 100 TB shape: the feed read is ≤ #versions change-set files, each
  * O(commit delta) — never a state scan; the parity audit's diff is
  * one key-grain join of two state versions (narrow columns — never
  * corpus text), run as an audit cadence, not per consumer. Replay is
  * a sequence of key-grain anti-join/union steps, each
  * O(delta + state).
  */
object ChangeFeed {

  /** Adjacent committed version pairs under a ledger root. */
  private def pairs(spark: SparkSession,
      root: String): Seq[(Long, String, Long, String)] = {
    val vs = Provenance.committedVersions(spark, root)
    vs.sliding(2).collect {
      case Seq((vf, _, pf), (vt, _, pt)) => (vf, pf, vt, pt)
    }.toSeq
  }

  /** q452: the registry ledger's feed — inserts for each appended
    * batch, deletes for the erasure rewrite, each row carrying the
    * values at (or, for deletes, before) the change.
    */
  def registryChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    val (_, root) = Erasure.erasedRegistryLedgerShared(spark, dir)
    feedFromRegistry(spark, root)
  }

  private[graft] def feedFromRegistry(spark: SparkSession,
      root: String): DataFrame =
    pairs(spark, root).map { case (vf, pf, vt, pt) =>
      if (Provenance.hasCommittedChangeset(spark, pt))
        spark.read.parquet(s"$pt/_changeset")
          .select(lit(vt).as("version_to"), col("change_type"),
            col("doc_id"), col("source"), col("n_chars"))
      else diffFeedVersion(spark, root, vf, vt)
    }.reduce(_.unionByName(_))
      .orderBy(col("version_to"), col("change_type"), col("doc_id"))

  /** The diff recovery of one version's change rows — the fallback
    * for undeclared versions and the q486 parity side. Both version
    * STATES read through the lake provider (the bridged ledger — one
    * table abstraction; `_changeset` metadata rides beside it).
    */
  private def diffFeedVersion(spark: SparkSession, root: String,
      vf: Long, vt: Long): DataFrame = {
    val prev = graft.sources.lake.LakeLedger.versionDf(spark, root, vf)
      .select(col("doc_id"), col("source").as("old_source"),
        col("n_chars").as("old_n_chars"))
    val cur = graft.sources.lake.LakeLedger.versionDf(spark, root, vt)
      .select(col("doc_id"), col("source"), col("n_chars"))
    cur.join(prev, Seq("doc_id"), "full_outer")
      .withColumn("change_type",
        when(col("old_source").isNull, "insert")
          .when(col("source").isNull, "delete")
          .when(col("source") =!= col("old_source") ||
            col("n_chars") =!= col("old_n_chars"), "update"))
      .filter(col("change_type").isNotNull)
      .select(lit(vt).as("version_to"), col("change_type"),
        col("doc_id"),
        coalesce(col("source"), col("old_source")).as("source"),
        coalesce(col("n_chars"), col("old_n_chars")).as("n_chars"))
  }

  /** q486: stored-vs-diffed change-set parity for the registry ledger
    * — per feed version, the row count each path reports and their
    * set equality on (change_type, doc_id). The audit that licenses
    * serving the feed from metadata (the q457 shape on this ledger):
    * an under-declared commit (a consumer would miss a change) or an
    * over-declared one (phantom changes) breaks the oracle hash.
    */
  def cdfStorageParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (_, root) = Erasure.erasedRegistryLedgerShared(spark, dir)
    pairs(spark, root).map { case (vf, _, vt, pt) =>
      val stored = spark.read.parquet(s"$pt/_changeset")
        .select(col("change_type"), col("doc_id"))
      val diffed = diffFeedVersion(spark, root, vf, vt)
        .select(col("change_type"), col("doc_id"))
      val nStored = stored.count()
      val nDiffed = diffed.count()
      val equal = nStored == nDiffed &&
        stored.join(diffed, Seq("change_type", "doc_id"), "left_anti")
          .count() == 0L
      (vt, nStored, nDiffed, equal)
    }.toDF("version", "n_stored", "n_diffed", "equal")
      .orderBy(col("version"))
  }

  /** q453: the OCC ledger's feed — pure updates, old and new values
    * side by side (writer A's +7 at v1, writer B's +11 at v2; the
    * aborted writer contributes nothing, which the oracle pins).
    */
  def occChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    val (_, root) = Occ.scheduleShared(spark, dir)
    pairs(spark, root).map { case (_, pf, vt, pt) =>
      val changes =
        if (Provenance.hasCommittedChangeset(spark, pt))
          // OCC commits store (key, old_val, new_val) — the feed's
          // exact grain, typed here (no-op declarations drop out)
          spark.read.parquet(s"$pt/_changeset")
        else {
          val prev = spark.read.parquet(pf)
            .select(col("c_custkey"), col("n_orders").as("old_val"))
          spark.read.parquet(pt)
            .select(col("c_custkey"), col("n_orders").as("new_val"))
            .join(prev, Seq("c_custkey"), "full_outer")
        }
      changes
        .withColumn("change_type",
          when(col("old_val").isNull, "insert")
            .when(col("new_val").isNull, "delete")
            .when(col("new_val") =!= col("old_val"), "update"))
        .filter(col("change_type").isNotNull)
        .select(lit(vt).as("version_to"), col("change_type"),
          col("c_custkey"), col("old_val"), col("new_val"))
    }.reduce(_.unionByName(_))
      .orderBy(col("version_to"), col("c_custkey"))
  }

  /** q471: CDF-driven incremental view maintenance — the composition
    * blocks 42/49 point at: a (source, lang) aggregate view seeded
    * from the v0 snapshot and maintained by APPLYING the feed
    * (inserts add, deletes subtract — additive measures, the q410
    * sign-flip merge driven by a real feed instead of its own state),
    * never rescanning the corpus. The oracle recomputes the final
    * corpus grain directly, so one lost or double-applied change row
    * breaks the hash; empty cells (a (source, lang) whose docs all
    * erased) drop out exactly as a recompute would drop them.
    */
  def mvIncrementalParity(spark: SparkSession, dir: String): DataFrame = {
    val (_, root) = Erasure.erasedRegistryLedgerShared(spark, dir)
    val vs = Provenance.committedVersions(spark, root)
    // registry state carries (doc_id, source, n_chars) — lang is not
    // in the ledger grain, so the view keys on source
    val v0 = spark.read.parquet(vs.head._3)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
    val feed = feedFromRegistry(spark, root)
      .withColumn("sign",
        when(col("change_type") === "delete", -1L).otherwise(1L))
    val deltas = feed.groupBy(col("source"))
      .agg(sum(col("sign")).as("d_docs"),
        sum(col("sign") * col("n_chars")).as("d_chars"))
    v0.join(deltas, Seq("source"), "full_outer")
      .na.fill(0L, Seq("n_docs", "n_chars", "d_docs", "d_chars"))
      .select(col("source"),
        (col("n_docs") + col("d_docs")).as("n_docs"),
        (col("n_chars") + col("d_chars")).as("n_chars"))
      .filter(col("n_docs") > 0L)
      .orderBy(col("source"))
  }

  /** q498: changelog compaction — the NET change set across the whole
    * feed (v0 → head): a key inserted and later deleted nets to
    * NOTHING; a surviving insert stays an insert; a delete of a
    * v0-resident key stays a delete. A consumer bootstrapping from
    * position 0 applies this set instead of the full history —
    * O(net) rows, the Kafka-compacted-topic / Delta-checkpoint move
    * on the stored feed. One key netted wrong (a resurrected
    * insert+delete pair, a dropped v0 delete) breaks the oracle hash.
    */
  def cdfNetChanges(spark: SparkSession, dir: String): DataFrame = {
    val (_, root) = Erasure.erasedRegistryLedgerShared(spark, dir)
    val feed = feedFromRegistry(spark, root).persist()
    graft.Caches.onRelease(() =>
      try feed.unpersist(false) catch { case _: Throwable => () })
    val ins = feed.filter(col("change_type") === "insert")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val del = feed.filter(col("change_type") === "delete")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val netIns = ins
      .join(del.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(lit("insert").as("change_type"), col("doc_id"),
        col("source"), col("n_chars"))
    val netDel = del
      .join(ins.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(lit("delete").as("change_type"), col("doc_id"),
        col("source"), col("n_chars"))
    netIns.unionByName(netDel)
      .orderBy(col("change_type"), col("doc_id"))
  }

  /** q516: the BRANCH-AWARE feed (block 87) — serve the CDF ACROSS a
    * merge: the trunk's own commits (v1/v2 drain folds) followed by
    * the branch's rehearsal landing as the merge commit (v3), served
    * from the change set the merge staged inside its version dir. The
    * claim that makes branches safe for consumers: a subscriber
    * cannot tell whether the erasure ran on the trunk or was
    * rehearsed on a branch and promoted — the feed is IDENTICAL
    * (q452's oracle verbatim), because the merge commit DECLARES its
    * changes like every other commit instead of forcing consumers
    * back to a snapshot diff at the merge boundary.
    */
  def branchMergeFeed(spark: SparkSession, dir: String): DataFrame = {
    val (res, sourceRoot) = ShallowClone.mergedRehearsalShared(spark, dir)
    require(res.outcome == "merged", s"fixture merge ${res.outcome}")
    feedFromRegistry(spark, sourceRoot)
  }

  /** q517: the consumer-side proof for q516 — replay the branch-aware
    * feed over the v0 snapshot to the MERGED head and roll it up: the
    * reconstruction must equal executing the erasure on the trunk
    * directly (q493's oracle verbatim). One change row lost at the
    * merge boundary breaks the hash.
    */
  def branchMergeFeedReplay(spark: SparkSession,
      dir: String): DataFrame = {
    val (res, sourceRoot) = ShallowClone.mergedRehearsalShared(spark, dir)
    require(res.outcome == "merged", s"fixture merge ${res.outcome}")
    val vs = Provenance.committedVersions(spark, sourceRoot)
    val v0 = spark.read.parquet(vs.head._3)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val feed = feedFromRegistry(spark, sourceRoot).persist()
    graft.Caches.onRelease(() =>
      try feed.unpersist(false) catch { case _: Throwable => () })
    val replayed = vs.map(_._1).drop(1).foldLeft(v0) { (state, vt) =>
      val delta = feed.filter(col("version_to") === vt)
      val dels = delta.filter(col("change_type") === "delete")
        .select(col("doc_id"))
      val upserts = delta
        .filter(col("change_type").isin("insert", "update"))
        .select(col("doc_id"), col("source"), col("n_chars"))
      state.join(broadcast(dels), Seq("doc_id"), "left_anti")
        .join(broadcast(upserts.select(col("doc_id"))), Seq("doc_id"),
          "left_anti")
        .unionByName(upserts)
    }
    replayed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy(col("source"))
  }

  /** q454: the consumer-side replay — apply the feed version by
    * version to the v0 snapshot and return the reconstruction, which
    * must equal the ledger's final version row-for-row (the oracle
    * recomputes the final state independently, so a feed that lost or
    * duplicated one change breaks the hash).
    */
  def changeFeedReplay(spark: SparkSession, dir: String): DataFrame = {
    val (_, root) = Erasure.erasedRegistryLedgerShared(spark, dir)
    val vs = Provenance.committedVersions(spark, root)
    val v0 = spark.read.parquet(vs.head._3)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val feed = feedFromRegistry(spark, root).persist()
    val replayed = vs.map(_._1).drop(1).foldLeft(v0) { (state, vt) =>
      val delta = feed.filter(col("version_to") === vt)
      val dels = delta.filter(col("change_type") === "delete")
        .select(col("doc_id"))
      val upserts = delta
        .filter(col("change_type").isin("insert", "update"))
        .select(col("doc_id"), col("source"), col("n_chars"))
      state.join(broadcast(dels), Seq("doc_id"), "left_anti")
        .join(broadcast(upserts.select(col("doc_id"))), Seq("doc_id"),
          "left_anti")
        .unionByName(upserts)
    }
    replayed.orderBy(col("doc_id"))
  }
}
