package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shallow clone / zero-copy branching (q474–q475, block 59): fork a
  * versioned ledger WITHOUT copying data — the clone's manifest
  * references the source's committed version paths; new writes land
  * in the clone's own root and diverge; the source never observes
  * them. Delta SHALLOW CLONE / Iceberg branch semantics, and the
  * operational move that makes experiments on a 100 TB table free:
  * an erasure rehearsal, a compaction trial, a what-if curriculum all
  * run on a branch that costs one metadata file.
  *
  * Mechanics on the `b<v>_<batch>` layout: the clone root holds a
  * refs parquet listing (version, path, owned) rows — versions
  * 0..n cloned by REFERENCE (owned = false, path pointing into the
  * source root), later clone-local writes appended with owned = true.
  * A reader resolves the latest version row and reads its path; the
  * source's own reader never consults the clone. Refs updates are
  * GENERATIONAL (`_refs_g<N>` dirs, readers resolve the highest
  * committed generation): the new table is committed under a fresh
  * name BEFORE any old one is removed, so there is no instant at
  * which no refs table exists — the delete-then-rename window the r15
  * ADVICE flagged is gone, and a crashed swap leaves at worst two
  * committed generations (max wins; old ones are GC'd best-effort on
  * the next swap). The divergence fixture: clone the q387 registry
  * ledger at its head, then run the %37 erasure rehearsal ON THE
  * CLONE ONLY.
  *
  * q474 is the divergence census (source head vs clone head row
  * counts and erased-key presence — source must still contain every
  * erased key, the clone none); q475 the storage-sharing audit (per
  * version: referenced-not-copied vs owned — the zero-copy claim as
  * a table). ShallowCloneSpec additionally pins byte-level
  * non-interference: the source's version paths are untouched after
  * the clone writes.
  *
  * 100 TB shape: the clone is #versions metadata rows; the rehearsal
  * pays only its own delta writes. Nothing here scans the corpus.
  */
object ShallowClone {

  /** Create a shallow clone of `sourceRoot`: a `_refs` table whose
    * rows reference the source's committed versions. Returns the
    * clone root.
    */
  private[graft] def clone(spark: SparkSession,
      sourceRoot: String): String = {
    import spark.implicits._
    val cloneRoot = graft.Caches.trackTempDir(
      Files.createTempDirectory("graft_clone_")).toString + "/branch"
    val refs = Provenance.committedVersions(spark, sourceRoot)
      .map { case (v, b, path) => (v, b, path, false) }
    refs.toDF("version", "batch_id", "path", "owned")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$cloneRoot/_refs_g0")
    cloneRoot
  }

  /** Committed refs generations under a clone root, ascending. */
  private def refGenerations(spark: SparkSession,
      cloneRoot: String): Seq[(Long, String)] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(cloneRoot)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("_refs_g"))
      .flatMap(n => n.drop(7).toLongOption.map(g => (g, s"$cloneRoot/$n")))
      .filter { case (_, path) =>
        fs.exists(new Path(s"$path/_SUCCESS")) }
      .sortBy(_._1).toSeq
  }

  /** Read the refs table: the highest committed generation. A reader
    * can never observe "no refs" mid-update — a new generation is
    * committed before any old one is removed.
    */
  private[graft] def refs(spark: SparkSession,
      cloneRoot: String): DataFrame = {
    val gens = refGenerations(spark, cloneRoot)
    val (_, path) = gens.lastOption.getOrElse(
      sys.error(s"no committed refs generation under $cloneRoot — " +
        "not a shallow-clone root, or the clone never committed"))
    spark.read.parquet(path)
  }

  /** Publish a new refs table as the next generation, then GC older
    * generations best-effort (a failed delete leaves extra committed
    * generations behind; readers always resolve the max, and the next
    * swap retries the GC).
    */
  private def swapRefs(spark: SparkSession, cloneRoot: String,
      updated: DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    val gens = refGenerations(spark, cloneRoot)
    val next = gens.lastOption.map(_._1 + 1L).getOrElse(0L)
    updated.coalesce(1).write.mode("overwrite")
      .parquet(s"$cloneRoot/_refs_g$next")
    val fs = new Path(cloneRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    gens.foreach { case (_, old) =>
      try fs.delete(new Path(old), true) catch { case _: Throwable => () }
    }
  }

  /** Latest version path visible to clone readers. */
  private[graft] def headPath(spark: SparkSession,
      cloneRoot: String): String =
    refs(spark, cloneRoot).orderBy(col("version").desc)
      .select(col("path")).limit(1).collect()(0).getString(0)

  /** Commit a clone-local rewrite of the head as the next version
    * (owned = true), leaving the source untouched.
    */
  private[graft] def commitOwned(spark: SparkSession, cloneRoot: String,
      next: DataFrame): Unit = {
    import spark.implicits._
    val r = refs(spark, cloneRoot).collect()
    val v = r.map(_.getAs[Long]("version")).max + 1L
    val b = r.maxBy(_.getAs[Long]("version")).getAs[Long]("batch_id")
    val dest = s"$cloneRoot/b${v}_$b"
    next.write.mode("overwrite").parquet(dest)
    val updated = r.map(x => (x.getAs[Long]("version"),
        x.getAs[Long]("batch_id"), x.getAs[String]("path"),
        x.getAs[Boolean]("owned"))) :+ ((v, b, dest, true))
    swapRefs(spark, cloneRoot,
      updated.toSeq.toDF("version", "batch_id", "path", "owned"))
  }

  /** Build the fixture: registry ledger, clone it, rehearse the %37
    * erasure on the clone. Returns (sourceRoot, cloneRoot).
    */
  private[graft] def rehearsal(spark: SparkSession,
      dir: String): (String, String) = {
    val sourceRoot = Erasure.registryLedgerShared(spark, dir)
    val cloneRoot = clone(spark, sourceRoot)
    val head = spark.read.parquet(headPath(spark, cloneRoot))
    commitOwned(spark, cloneRoot,
      head.filter(col("doc_id") % 37 =!= 0))
    (sourceRoot, cloneRoot)
  }

  /** q474: the divergence census — one row per side with its head
    * row count and how many erased-request keys remain readable.
    * The source must retain every %37 key (the rehearsal did not
    * leak); the clone none.
    */
  def cloneDivergence(spark: SparkSession, dir: String): DataFrame = {
    val (sourceRoot, cloneRoot) = rehearsal(spark, dir)
    val sourceHead = Provenance.committedVersions(spark, sourceRoot)
      .maxBy(_._1)._3
    def census(side: String, path: String): DataFrame =
      spark.read.parquet(path)
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(when(col("doc_id") % 37 === 0, 1L)
            .otherwise(0L)), lit(0L)).as("n_erased_readable"))
        .select(lit(side).as("side"), col("n_rows"),
          col("n_erased_readable"))
    census("clone", headPath(spark, cloneRoot))
      .unionByName(census("source", sourceHead))
      .orderBy(col("side"))
  }

  /** The merge outcome (q492's row). */
  private[graft] final case class MergeResult(
      forkVersion: Long, nCloneDeletes: Long, nCloneUpserts: Long,
      nSourceChanges: Long, nConflicts: Long, outcome: String,
      mergedVersion: Long, mergedRows: Long)

  /** Merge the clone's owned delta back into its source (q492–q493):
    * the branch workflow's missing second half — a rehearsal that
    * SUCCEEDED gets promoted instead of re-executed. The protocol is
    * the OCC discipline at branch grain:
    *
    *  1. the clone's change set is computed against its FORK point
    *     (the highest referenced, non-owned version): key deletes
    *     (fork ∖ head) and value upserts (new or changed rows);
    *  2. it is conflict-checked against everything the SOURCE
    *     committed since the fork (stored change sets when declared,
    *     diff fallback — [[Occ]]'s changesSince shape). Overlap →
    *     abort: the rehearsal must be re-run on a fresh branch;
    *  3. disjoint → the delta re-applies onto the source head and
    *     commits as the source's next version, change set staged
    *     inside and landed by one rename (the CDF-visible commit).
    *
    * The target MUTATES, so the fixture merges into a PRIVATE copy of
    * the drained registry ledger, never the shared artifact.
    *
    * 100 TB shape: the delta is key-grain (≤ branch writes), the
    * conflict check reads change-set metadata, the merge commit is
    * the one rewrite the branch was for, and the claim is one rename.
    */
  private[graft] def merge(spark: SparkSession, sourceRoot: String,
      cloneRoot: String): MergeResult = {
    import org.apache.hadoop.fs.Path
    val r = refs(spark, cloneRoot).collect()
    val forkVersion = r.filter(!_.getAs[Boolean]("owned"))
      .map(_.getAs[Long]("version")).max
    val forkPath = r.find(x => x.getAs[Long]("version") == forkVersion)
      .get.getAs[String]("path")
    val fork = spark.read.parquet(forkPath)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val head = spark.read.parquet(headPath(spark, cloneRoot))
      .select(col("doc_id"), col("source"), col("n_chars"))
    val deletes = fork.join(head.select(col("doc_id")), Seq("doc_id"),
      "left_anti").persist()
    val upserts = head.join(
        fork.select(col("doc_id"), col("source").as("f_source"),
          col("n_chars").as("f_chars")), Seq("doc_id"), "left")
      .filter(col("f_source").isNull ||
        col("f_source") =!= col("source") ||
        col("f_chars") =!= col("n_chars"))
      .select(col("doc_id"), col("source"), col("n_chars")).persist()
    val nDeletes = deletes.count()
    val nUpserts = upserts.count()
    // what the source committed past the fork — stored change sets
    // first, diff fallback for undeclared versions
    val srcVersions = Provenance.committedVersions(spark, sourceRoot)
    val after = srcVersions.filter(_._1 > forkVersion)
    val srcChanged =
      if (after.isEmpty) None
      else Some(after.map { case (v, _, path) =>
        if (Provenance.hasCommittedChangeset(spark, path))
          spark.read.parquet(s"$path/_changeset").select(col("doc_id"))
        else {
          // the fallback diff must watch EVERY mutable column (the
          // ChangeFeed.diffFeedVersion predicate): a legacy source
          // commit that changed only `source` for a doc is still a
          // conflicting write, and missing it would let the merge
          // silently overwrite that commit. Null-SAFE comparisons
          // throughout: a commit that moved a column between NULL and
          // a value is a change too — `=!=` would yield NULL there and
          // silently drop the row from the conflict set.
          val parent = srcVersions.filter(_._1 < v).maxBy(_._1)._3
          val prev = spark.read.parquet(parent)
            .select(col("doc_id"), col("source").as("p_source"),
              col("n_chars").as("p_chars"))
          spark.read.parquet(path)
            .select(col("doc_id"), col("source"), col("n_chars"))
            .join(prev, Seq("doc_id"), "full_outer")
            .filter(!(col("p_chars") <=> col("n_chars")) ||
              !(col("p_source") <=> col("source")))
            .select(col("doc_id"))
        }
      }.reduce(_.unionByName(_)).distinct().persist())
    val nSrcChanges = srcChanged.map(_.count()).getOrElse(0L)
    val branchKeys = deletes.select(col("doc_id"))
      .unionByName(upserts.select(col("doc_id")))
    val nConflicts = srcChanged
      .map(_.join(branchKeys, Seq("doc_id"), "inner").count())
      .getOrElse(0L)
    if (nConflicts > 0L) {
      deletes.unpersist(false); upserts.unpersist(false)
      srcChanged.foreach(_.unpersist(false))
      return MergeResult(forkVersion, nDeletes, nUpserts, nSrcChanges,
        nConflicts, "aborted", -1L, -1L)
    }
    val (v, b, srcHeadPath) = srcVersions.maxBy(_._1)
    val merged = spark.read.parquet(srcHeadPath)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .join(broadcast(branchKeys), Seq("doc_id"), "left_anti")
      .unionByName(upserts)
    val dest = s"$sourceRoot/b${v + 1}_$b"
    val staging = s"$sourceRoot/_staging_b${v + 1}_${b}_merge"
    merged.write.mode("overwrite").parquet(staging)
    deletes.withColumn("change_type", lit("delete"))
      .unionByName(upserts.withColumn("change_type", lit("upsert")))
      .select(col("change_type"), col("doc_id"), col("source"),
        col("n_chars"))
      .write.mode("overwrite").parquet(s"$staging/_changeset")
    val fs = new Path(sourceRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(dest)) ||
        !fs.rename(new Path(staging), new Path(dest)))
      sys.error(s"branch merge commit failed: rename($staging -> $dest)")
    val mergedRows = spark.read.parquet(dest).count()
    deletes.unpersist(false); upserts.unpersist(false)
    srcChanged.foreach(_.unpersist(false))
    MergeResult(forkVersion, nDeletes, nUpserts, nSrcChanges, 0L,
      "merged", v + 1, mergedRows)
  }

  /** The merge fixture: a PRIVATE drained-registry copy as source,
    * clone, %37 rehearsal on the branch, merge back.
    */
  private[graft] def mergedRehearsal(spark: SparkSession,
      dir: String): (MergeResult, String) = {
    val sourceRoot = Erasure.registryLedgerDrained(spark, dir)
    val cloneRoot = clone(spark, sourceRoot)
    val head = spark.read.parquet(headPath(spark, cloneRoot))
    commitOwned(spark, cloneRoot,
      head.filter(col("doc_id") % 37 =!= 0))
    (merge(spark, sourceRoot, cloneRoot), sourceRoot)
  }

  /** [[mergedRehearsal]] as a build-once SHARED artifact: the
    * rehearsal is a deterministic fixture and its four consumers
    * (q492/q493/q516/q517) only READ the merged trail, so each used
    * to pay the private copy + clone + commit + merge job chain per
    * query. The MergeResult stats ride beside the ledger as a one-row
    * parquet, re-read on a fresh hit.
    */
  private[graft] def mergedRehearsalShared(spark: SparkSession,
      dir: String): (MergeResult, String) = {
    import spark.implicits._
    val fp = LedgerArtifacts.fingerprint(
      graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("n_chars")),
      Seq("doc_id", "n_chars"))
    val state = LedgerArtifacts.shared(spark,
      s"merged_rehearsal_${LedgerArtifacts.dirKey(dir)}", fp) {
      scratch =>
        val sourceRoot = s"$scratch/state"
        LedgerArtifacts.copyLedger(spark,
          Erasure.registryLedgerDrained(spark, dir), sourceRoot)
        val cloneRoot = clone(spark, sourceRoot)
        val head = spark.read.parquet(headPath(spark, cloneRoot))
        commitOwned(spark, cloneRoot,
          head.filter(col("doc_id") % 37 =!= 0))
        val res = merge(spark, sourceRoot, cloneRoot)
        Seq((res.forkVersion, res.nCloneDeletes, res.nCloneUpserts,
            res.nSourceChanges, res.nConflicts, res.outcome,
            res.mergedVersion, res.mergedRows))
          .toDF("fork_version", "n_clone_deletes", "n_clone_upserts",
            "n_source_changes", "n_conflicts", "outcome",
            "merged_version", "merged_rows")
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$scratch/merge_result")
    }
    val resRoot = new org.apache.hadoop.fs.Path(state)
      .getParent.toString
    val r = spark.read.parquet(s"$resRoot/merge_result").collect()(0)
    (MergeResult(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getString(5), r.getLong(6),
      r.getLong(7)), state)
  }

  /** q492: the merge audit — fork point, branch delta sizes, source
    * movement since the fork, conflicts, verdict, and the merged
    * version's row count. The deterministic fixture: fork at v2,
    * the %37 rehearsal's deletes, an unmoved source, a clean merge
    * committing v3.
    */
  def branchMergeAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (res, _) = mergedRehearsalShared(spark, dir)
    Seq((res.forkVersion, res.nCloneDeletes, res.nCloneUpserts,
        res.nSourceChanges, res.nConflicts, res.outcome,
        res.mergedVersion, res.mergedRows))
      .toDF("fork_version", "n_clone_deletes", "n_clone_upserts",
        "n_source_changes", "n_conflicts", "outcome",
        "merged_version", "merged_rows")
  }

  /** q493: the merged source head per source group — the rehearsal's
    * outcome PROMOTED: identical to executing the erasure on the
    * source directly (the oracle recomputes that form).
    */
  def branchMergeState(spark: SparkSession, dir: String): DataFrame = {
    val (res, sourceRoot) = mergedRehearsalShared(spark, dir)
    require(res.outcome == "merged", s"fixture merge ${res.outcome}")
    val head = Provenance.committedVersions(spark, sourceRoot)
      .maxBy(_._1)._3
    spark.read.parquet(head)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy(col("source"))
  }

  /** q475: the storage-sharing audit — per version visible to the
    * clone: row count and whether the bytes are referenced (shared
    * with the source) or owned (the branch's own delta). Exactly one
    * owned version (the rehearsal), everything else shared.
    */
  def cloneStorageAudit(spark: SparkSession, dir: String): DataFrame = {
    val (_, cloneRoot) = rehearsal(spark, dir)
    val r = refs(spark, cloneRoot).collect()
    import spark.implicits._
    r.map { x =>
      val n = spark.read.parquet(x.getAs[String]("path")).count()
      (x.getAs[Long]("version"), n, x.getAs[Boolean]("owned"))
    }.toSeq.toDF("version", "n_rows", "owned")
      .orderBy(col("version"))
  }
}
