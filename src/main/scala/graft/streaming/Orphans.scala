package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Orphan detection + GC under a ledger root (q499–q500, block 74):
  * the maintenance job BESIDE version expiry ([[Erasure.vacuum]]) —
  * Iceberg's `remove_orphan_files` next to `expire_snapshots`. A
  * crashed writer strands an uncommitted version dir (data written,
  * no `_SUCCESS`); a sloppy export leaves a stray file. Readers
  * already ignore both (the commit-marker rule), but they cost
  * storage forever and — worse — a strand named like a future version
  * could collide with a later claim. The audit classifies every
  * entry under the root: `committed_version` (b-name with its
  * marker), `orphan_uncommitted` (b-name, markerless), and
  * `orphan_foreign` (anything else, including `_staging_*` strands of
  * crashed commits); GC deletes exactly the orphans.
  *
  * Safety rule: GC never touches a committed version (q500 re-reads
  * them to prove it) and never reaches outside the root (tombstone
  * tables are SIBLINGS of the root by design — see
  * `Erasure.tombstonePath` — precisely so maintenance inside the
  * root cannot brick the erasure contract).
  *
  * The fixture plants one markerless copy of v0 (`b9_9`) and one
  * stray file on a PRIVATE ledger copy — deterministic, so both
  * queries hash-oracle.
  *
  * 100 TB shape: listing + classification is driver-side metadata
  * (≤ #entries); deletes are file ops; the audit's row counts are
  * ≤ #versions narrow scans. Nothing reads row data of the corpus.
  */
object Orphans {

  /** Plant the two orphan kinds on a private drained-registry copy. */
  private def planted(spark: SparkSession, dir: String): String = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val root = Erasure.registryLedgerDrained(spark, dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(root).getFileSystem(conf)
    val v0 = Provenance.committedVersions(spark, root).head._3
    // a crashed writer's strand: data present, marker absent
    if (!FileUtil.copy(fs, new Path(v0), fs, new Path(s"$root/b9_9"),
        false, conf))
      sys.error(s"orphan fixture copy failed under $root")
    fs.delete(new Path(s"$root/b9_9/_SUCCESS"), false)
    // a stray export file
    fs.create(new Path(s"$root/tmp_export_stray"), true).close()
    root
  }

  /** Classify every entry under a ledger root. */
  private def classify(spark: SparkSession,
      root: String): Seq[(String, String, Long)] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = Provenance.committedVersions(spark, root)
    val committed = versions.map(v => new Path(v._3).getName).toSet
    // a committed version's LAKE BRIDGE manifest (`_commit_v<N>`,
    // LakeLedger) is that snapshot's own derived metadata — it lives
    // and dies with the version, so it is neither an entry of its own
    // nor an orphan; an UNMATCHED bridge (its version vacuumed) stays
    // orphan_foreign and falls to GC like any strand
    val bridged = versions.map(v => s"_commit_v${v._1}").toSet
    fs.listStatus(new Path(root)).toSeq
      .filterNot(st => bridged.contains(st.getPath.getName))
      .map { st =>
        val name = st.getPath.getName
        val kind =
          if (committed.contains(name)) "committed_version"
          else if (st.isDirectory && name.startsWith("b") &&
            !name.contains("staging")) "orphan_uncommitted"
          else "orphan_foreign"
        val nRows =
          if (kind == "orphan_foreign") 0L
          else spark.read.parquet(st.getPath.toString).count()
        (name, kind, nRows)
      }.sortBy(_._1)
  }

  /** Default orphan retention: entries younger than this survive GC.
    * The stage→rename window of a LIVE writer looks exactly like a
    * crashed writer's strand from the outside; Iceberg's
    * `remove_orphan_files` gates on age for the same reason. Three
    * days comfortably exceeds any sane commit latency.
    */
  private[graft] val DefaultRetentionMs: Long = 3L * 24 * 3600 * 1000

  /** Delete every non-committed entry under the root older than
    * `minAgeMs` (by filesystem modification time). Entries younger
    * than the threshold are skipped — they may be a concurrent
    * writer's in-flight `_staging_*` dir, and deleting one mid-commit
    * fails that commit. Pass `minAgeMs = 0` ONLY when the caller
    * guarantees no concurrent writers on the root (the fixture does:
    * a private copy, single JVM, drained stream).
    */
  private[graft] def gc(spark: SparkSession, root: String,
      minAgeMs: Long = DefaultRetentionMs): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = Provenance.committedVersions(spark, root)
    val committed = versions.map(v => new Path(v._3).getName).toSet ++
      // a live version's lake-bridge manifest is its metadata; an
      // unmatched bridge (version vacuumed) is GC'able like any
      // strand (LakeLedger rebuilds bridges on demand anyway)
      versions.map(v => s"_commit_v${v._1}")
    val cutoff = System.currentTimeMillis() - minAgeMs
    fs.listStatus(new Path(root))
      .filter(st => !committed.contains(st.getPath.getName))
      .filter(st => st.getModificationTime <= cutoff)
      .foreach(st => fs.delete(st.getPath, true))
  }

  /** q499: the orphan audit — every entry under the planted root with
    * its classification and readable rows. The review table an
    * operator signs before the GC runs.
    */
  def orphanAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    classify(spark, planted(spark, dir))
      .toDF("entry", "kind", "n_rows")
      .orderBy(col("entry"))
  }

  /** q500: the post-GC state — orphans gone, every committed version
    * intact and re-read (the safety half of the contract).
    */
  def orphanGcState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = planted(spark, dir)
    // minAgeMs = 0: the planted root is a private copy with no
    // concurrent writers, and the fixture's orphans are seconds old
    gc(spark, root, minAgeMs = 0L)
    classify(spark, root)
      .toDF("entry", "kind", "n_rows")
      .orderBy(col("entry"))
  }
}
