package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OPTIMIZE for the VERSIONED LEDGERS (q519–q520, block 89) — the
  * q487 executor pattern applied to state trails, closing the round's
  * last telemetry loop: [[StreamState]] compacts the append-only
  * state DIRS (q242), the q487 executor rewrites the simulated batch
  * layout, but nothing compacted a `b<v>_<batch>` trail's HEAD — and
  * at a 1-minute trigger cadence a ledger head accretes thousands of
  * small part files that every consumer re-opens.
  *
  * The executor rewrites the head version SIZE-BOUNDED (output file
  * count from observed bytes/row against a target file size, the
  * [[StreamState.maybeCompact]] sizing discipline) and commits it as
  * the NEXT version carrying the RETIRED version's batch id — the
  * q450 rewrite rule, so the stream-position axis is untouched:
  * `AS OF batch b` resolves to the rewrite, replay gates see the same
  * frontier. The commit stages data + an EMPTY `_changeset` (a
  * content-identical rewrite DECLARES itself a no-op, so CDF
  * consumers skip it by metadata instead of diffing two snapshots) +
  * the commit timestamp, landed by one rename. Cadence is
  * telemetry-driven: [[maybeOptimize]] fires only past a head
  * file-count threshold, and returns None when the head is already
  * packed — running it on a quiet trail is free and idempotent.
  *
  * 100 TB shape: cost is one read+write of the HEAD (the state
  * grain, ≤ #keys rows — never the corpus), no shuffle (coalesce);
  * the audit columns are metadata + two 1-pass aggregates; history
  * stays immutable (old versions untouched — vacuum owns their
  * retirement).
  */
object LedgerOptimize {

  /** One executed rewrite's audit facts. */
  private[graft] final case class OptimizeResult(
      versionRetired: Long, versionCommitted: Long, batchId: Long,
      filesBefore: Long, filesAfter: Long, rowsBefore: Long,
      rowsAfter: Long, checksumBefore: Long, checksumAfter: Long)

  /** 40-bit additive content checksum over ALL columns — canonical
    * `|`-join, order-independent sum (the [[Integrity]] algebra,
    * schema-generic).
    */
  private def checksumOf(df: DataFrame): Long = {
    val cols = df.columns.mkString(", ")
    val r = df.agg(coalesce(sum(expr(
      s"CAST(conv(substring(md5(concat_ws('|', $cols)), 1, 10), " +
        "16, 10) AS LONG)")), lit(0L))).collect()(0)
    r.getLong(0)
  }

  /** Rewrite the head version packed when its part-file count exceeds
    * `maxFiles` (or unconditionally with `force`). Returns None when
    * the trail is empty or the head is already within bounds.
    */
  private[graft] def maybeOptimize(spark: SparkSession, root: String,
      maxFiles: Int = 32,
      targetBytesPerFile: Long = 128L * 1024 * 1024,
      force: Boolean = false): Option[OptimizeResult] = {
    import org.apache.hadoop.fs.Path
    val versions = Provenance.committedVersions(spark, root)
    if (versions.isEmpty) return None
    val (v, b, headPath) = versions.maxBy(_._1)
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new Path(headPath))
      .filter(_.getPath.getName.endsWith(".parquet"))
    if (parts.isEmpty || (!force && parts.length <= maxFiles))
      return None
    val bytesBefore = parts.map(_.getLen).sum
    val head = spark.read.parquet(headPath).persist()
    try {
      val rowsBefore = head.count()
      val ckBefore = checksumOf(head)
      val bytesPerRow =
        math.max(1L, bytesBefore / math.max(1L, rowsBefore))
      val maxRecs = math.max(1L, targetBytesPerFile / bytesPerRow)
      val nFiles = math.min(10000L,
        math.max(1L, (rowsBefore + maxRecs - 1) / maxRecs))
      val staging = s"$root/_staging_b${v + 1}_${b}_optimize"
      fs.delete(new Path(staging), true)
      head.coalesce(nFiles.toInt)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", maxRecs)
        .parquet(staging)
      // a content-identical rewrite declares ITSELF: empty change set
      spark.read.parquet(staging).limit(0)
        .withColumn("change_type", lit(""))
        .write.mode("overwrite").parquet(s"$staging/_changeset")
      Provenance.writeCommitTs(spark, staging,
        Provenance.CommitClock.ofBatch(b))
      val dest = s"$root/b${v + 1}_$b"
      // rename + ownership verify (the Occ.tryCommit discipline):
      // Hadoop rename has mv semantics — renaming onto an EXISTING
      // dest nests the staging dir inside it and returns true, so a
      // bare exists+rename is a TOCTOU window in which a writer racing
      // this optimizer would have its version silently adopted as our
      // rewrite. If our uniquely-named staging dir now sits nested
      // inside dest, the rename lost — undo the nest and fail loudly.
      if (fs.exists(new Path(dest)) ||
          !fs.rename(new Path(staging), new Path(dest)))
        sys.error(s"ledger optimize commit failed: " +
          s"rename($staging -> $dest)")
      val nested = new Path(dest, new Path(staging).getName)
      if (fs.exists(nested)) {
        fs.delete(nested, true)
        sys.error(s"ledger optimize commit lost a race: $dest was " +
          s"committed by another writer between exists() and rename()")
      }
      val after = spark.read.parquet(dest)
      val filesAfter = fs.listStatus(new Path(dest))
        .count(_.getPath.getName.endsWith(".parquet")).toLong
      Some(OptimizeResult(v, v + 1, b, parts.length.toLong, filesAfter,
        rowsBefore, after.count(), ckBefore, checksumOf(after)))
    } finally head.unpersist(false)
  }

  /** q519: the executed rewrite's audit on a private registry trail —
    * versions, batch id carried, row conservation, content-checksum
    * equality, no file growth, and CDF SILENCE (the feed across the
    * rewrite emits zero change rows — consumers skip it by metadata).
    */
  def ledgerOptimizeAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = Erasure.registryLedgerDrained(spark, dir)
    val res = maybeOptimize(spark, root, force = true)
      .getOrElse(sys.error("forced ledger optimize did not run"))
    val feedRows = ChangeFeed.feedFromRegistry(spark, root)
      .filter(col("version_to") === res.versionCommitted).count()
    Seq((res.versionRetired, res.versionCommitted, res.batchId,
        res.rowsBefore, res.rowsAfter,
        res.checksumBefore == res.checksumAfter,
        res.filesAfter <= res.filesBefore, feedRows))
      .toDF("version_retired", "version_committed", "batch_id",
        "rows_before", "rows_after", "content_intact",
        "files_not_increased", "n_feed_rows")
  }

  /** q520: the trail after the rewrite — the manifest plus the
    * batch-axis proof: the rewrite carries batch 2, so `AS OF batch
    * 2` resolves to the REWRITE's version (the stream position
    * absorbed it), while versions 0–2 stand untouched.
    */
  def ledgerOptimizeTrail(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = Erasure.registryLedgerDrained(spark, dir)
    maybeOptimize(spark, root, force = true)
      .getOrElse(sys.error("forced ledger optimize did not run"))
    val asOf2 = Provenance.ledgerAsOfBatch(spark, root, 2L).count()
    Provenance.committedVersions(spark, root).map { case (v, b, path) =>
      (v, b, spark.read.parquet(path).count(), asOf2)
    }.toDF("version", "batch_id", "n_rows", "n_rows_asof_batch2")
      .orderBy(col("version"))
  }
}
