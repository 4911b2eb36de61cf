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
