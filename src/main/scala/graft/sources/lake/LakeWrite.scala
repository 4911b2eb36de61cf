package graft.sources.lake

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types._

/** The lake format's DSv2 WRITE path (q534/q535, block 96 — the r17
  * verdict's "standard front door"): `df.write.format(lake)
  * .option("path", root).option("batchId", b).mode("append").save()`
  * commits one snapshot through the same protocol every committer in
  * this engine uses — stage, atomic-claim rename with nested-ownership
  * verify, metadata last — keyed by batch id for idempotent retry.
  *
  * Protocol (writer u, batch b):
  *  1. executors stage parquet data files under `data_u<uuid>/` —
  *     uuid-named, never renamed, unreachable until a manifest names
  *     them (readers only open manifest-listed paths);
  *  2. the driver stages a COMMIT DIR `_staging_c_<uuid>/manifest.tsv`
  *     holding the complete new manifest (previous snapshot's lines +
  *     this batch's, `#props` carrying batch_id), then claims version
  *     V+1 by renaming it to `_commit_v<V+1>` — a DIRECTORY rename
  *     because Hadoop file rename overwrites on local-fs semantics and
  *     so cannot claim-if-absent; the nested-ownership verify
  *     ([[graft.streaming.Occ]]'s discipline) detects a lost race, and
  *     the loser recomputes against the new latest and tries V+2;
  *  3. replay safety: a batch id equal to the LATEST snapshot's is a
  *     committed retry — the write no-ops and deletes its staging
  *     (exactly the ledgers' batch-id idempotence, on the format).
  *
  * Crash anywhere leaves only underscore-hidden staging or
  * manifest-unreferenced `data_u*` dirs — no partial snapshot is ever
  * listable, which LakeWriteSpec pins by killing a commit mid-way.
  *
  * 100 TB shape: executors write data files in parallel (one per input
  * partition) and ship only metadata-sized stats messages (path, row
  * count, zone extrema, bloom words) to the driver; the commit itself
  * touches one manifest whatever the data volume.
  */
private[lake] class LakeWriteBuilder(root: String,
    info: LogicalWriteInfo) extends WriteBuilder {

  override def build(): Write = new Write
      with RequiresDistributionAndOrdering {
    private val meta = GraftLake.readMeta(root)

    /** Partitioned appends (block 107, q554/q555): the write DEMANDS
      * rows clustered and sorted by the partition SOURCE column, so
      * each task receives whole partition-value runs and the writer
      * cuts one file per value as the pval changes — every committed
      * file keeps the one-pval-per-file invariant the planner prunes
      * on. Identity clustering is used for every transform (it
      * refines day/bucket grouping and resolves without a function
      * catalog); a production deployment would register the
      * transform functions and cluster by `days(ts)`/`bucket(n,c)`
      * directly for coarser, fuller files.
      */
    override def requiredDistribution()
        : org.apache.spark.sql.connector.distributions.Distribution =
      meta.partSpec match {
        case Some(spec) =>
          org.apache.spark.sql.connector.distributions.Distributions
            .clustered(Array(
              org.apache.spark.sql.connector.expressions.Expressions
                .identity(spec.col)))
        case None =>
          org.apache.spark.sql.connector.distributions.Distributions
            .unspecified()
      }

    override def requiredOrdering()
        : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
      meta.partSpec match {
        case Some(spec) => Array(
          org.apache.spark.sql.connector.expressions.Expressions.sort(
            org.apache.spark.sql.connector.expressions.Expressions
              .column(spec.col),
            org.apache.spark.sql.connector.expressions.SortDirection
              .ASCENDING))
        case None => Array.empty
      }

    override def toBatch: BatchWrite = {
      val got = info.schema()
      require(got.fields.map(f => (f.name, f.dataType)).toSeq ==
        meta.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"graft-lake: append schema ${got.simpleString} does not " +
          s"match table schema ${meta.schema.simpleString}")
      val batchId = Option(info.options.get("batchId")).getOrElse(
        sys.error("graft-lake: writes require a 'batchId' option — " +
          "the idempotence key a replayed commit is recognized by"))
      require(!batchId.contains(',') && !batchId.contains('\t') &&
        !batchId.contains('\n'), "graft-lake: batchId must not " +
        "contain ',', tab or newline (it joins the carried id set)")
      new LakeBatchWrite(root, meta, batchId)
    }
  }
}

/** The version-claim loop EVERY lake committer shares (append,
  * OPTIMIZE, MERGE): recompute the successor manifest against the
  * CURRENT latest snapshot, stage it, claim version latest+1 by a
  * directory rename with the nested-ownership verify
  * ([[graft.streaming.Occ]]'s discipline — Hadoop rename onto an
  * extant dir nests and returns true), and on a lost race recompute
  * against the new latest. Batch-id idempotence is checked per
  * attempt against the CARRIED id set, so a duplicate submission
  * no-ops however many commits after its twin landed.
  */
private[lake] object LakeCommit {

  /** Ids already on the trail at `latest` — the retry-recognition
    * window (capped at 256 carried ids when re-written).
    */
  def seenIds(latest: LakeMeta): Seq[String] =
    latest.props.get("batch_ids")
      .map(_.split(',').filter(_.nonEmpty).toSeq)
      .getOrElse(latest.props.get("batch_id").filter(_ != "-").toSeq)

  /** The `#props` line a committer writes: its own id, the claimed
    * version, and the carried id set extended by itself.
    */
  def propsLine(batchId: String, nextV: Long,
      seen: Seq[String]): String =
    s"#props\tbatch_id=$batchId\tversion=$nextV" +
      s"\tbatch_ids=${((seen :+ batchId).distinct.takeRight(256))
        .mkString(",")}"

  /** Run the claim loop. `body(latestVersion, latestMeta, seen,
    * nextV)` produces the full successor manifest text against the
    * attempt's latest snapshot. Returns the committed version, or
    * None when `batchId` was already on the trail (idempotent
    * replay — the caller drops its staged data).
    */
  def claim(fs: org.apache.hadoop.fs.FileSystem, root: String,
      batchId: String,
      body: (Option[Long], LakeMeta, Seq[String], Long) => String)
      : Option[Long] = {
    val stagingUuid = UUID.randomUUID.toString.take(12)
    var attempts = 0
    while (attempts < 64) {
      attempts += 1
      val latestVs = GraftLake.committedVersions(fs, root)
      val latest = GraftLake.readMeta(root, latestVs.lastOption)
      val seen = seenIds(latest)
      if (seen.contains(batchId)) return None
      val nextV = if (latestVs.nonEmpty) latestVs.max + 1 else 1L
      val text = body(latestVs.lastOption, latest, seen, nextV)
      val staging = s"$root/_staging_c_$stagingUuid"
      fs.delete(new HPath(staging), true)
      val out = fs.create(new HPath(s"$staging/manifest.tsv"), true)
      try out.write(text.getBytes("UTF-8")) finally out.close()
      val dest = new HPath(s"$root/_commit_v$nextV")
      // the atomic claim + nested-ownership verify (Occ discipline)
      if (!fs.exists(dest) && fs.rename(new HPath(staging), dest)) {
        val nested = new HPath(dest, new HPath(staging).getName)
        if (!fs.exists(nested)) return Some(nextV)
        fs.delete(nested, true) // lost the race onto an extant dest
      } else fs.delete(new HPath(staging), true)
      // lost: another writer claimed nextV — recompute against it
    }
    sys.error(s"graft-lake: commit of batch $batchId to $root lost " +
      s"$attempts consecutive version claims — giving up")
  }
}

/** One written file's inline-folded stats. */
private[lake] final case class LakeFileStat(relPath: String,
    nRows: Long, zMin: Array[Long], zMax: Array[Long],
    bloom: Array[Long], pval: Option[Long])

/** One task's stats message — the only thing an executor sends the
  * driver (metadata-sized by construction): one record per file the
  * task cut (one on an unpartitioned table; one per partition-value
  * run on a partitioned one).
  */
private[lake] final case class LakeTaskStats(partitionId: Int,
    files: Seq[LakeFileStat]) extends WriterCommitMessage

private[lake] class LakeBatchWrite(root: String, meta: LakeMeta,
    batchId: String) extends BatchWrite {

  private val writeUuid = UUID.randomUUID.toString.take(12)
  private val dataSubdir = s"data_u$writeUuid"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    // the write-side converter keys the built-in source sets
    // explicitly (read with no default by ParquetWriteSupport.init)
    Seq("spark.sql.parquet.writeLegacyFormat" -> "false",
      "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS",
      "spark.sql.parquet.fieldId.write.enabled" -> "false",
      "spark.sql.parquet.datetimeRebaseModeInWrite" -> "CORRECTED",
      "spark.sql.parquet.int96RebaseModeInWrite" -> "CORRECTED",
      "spark.sql.parquet.variant.annotateLogicalType.enabled" -> "false",
      "spark.sql.legacy.parquet.nanosAsLong" -> "false")
      .foreach { case (k, d) =>
        conf.set(k, spark.conf.getOption(k).getOrElse(d))
      }
    new LakeWriterFactory(s"$root/$dataSubdir", meta.schema,
      meta.zoneCols, meta.bloomCol, meta.partSpec,
      new SerializableHadoopConf(conf))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new HPath(root).getFileSystem(GraftLake.hadoopConf)
    val stats = messages.collect { case m: LakeTaskStats => m }
      .sortBy(_.partitionId)
      .flatMap(_.files).filter(_.nRows > 0)
    if (stats.isEmpty) {
      // an empty append commits nothing — keeps version counts free
      // of no-data micro-batches (a streaming sink's trailing batch)
      fs.delete(new HPath(s"$root/$dataSubdir"), true)
      return
    }
    // replay recognition is against the CARRIED batch-id set, not
    // just the latest commit's own id: under concurrent writers a
    // duplicate submission can arrive arbitrarily many commits after
    // its twin landed (the lake race fixture exercises exactly this).
    // The set is capped — the documented retention window for retry
    // recognition, the same contract as per-app txn versions in a
    // real format's log.
    val committed = LakeCommit.claim(fs, root, batchId,
      (latestV, latest, seen, nextV) => {
        val nextFileId = (latest.files.map(_.fileId) ++ Seq(-1L)).max + 1
        val lines = stats.zipWithIndex.map { case (m, i) =>
          s"${nextFileId + i}\t${m.relPath}\t${m.nRows}" +
            s"\t${m.zMin.mkString(",")}\t${m.zMax.mkString(",")}" +
            s"\t${if (meta.bloomCol.isDefined) m.bloom.mkString(",")
              else "-"}\t-\t0" + m.pval.fold("")(v => s"\t$v")
        }
        val header = s"#schema\t${meta.schema.fields.map(f =>
          s"${f.name}:${LakeEncode.typeName(f.dataType)}").mkString(",")
          }\t${meta.zoneCols.mkString(",")}\t${meta.bloomCol.getOrElse("-")
          }${meta.partSpec.fold("")(s => s"\t${s.render}")}"
        val existing = GraftLake.rawFileLines(fs, root, latestV)
        (Seq(header, LakeCommit.propsLine(batchId, nextV, seen)) ++
          existing ++ lines).mkString("", "\n", "\n")
      })
    if (committed.isEmpty) {
      // committed retry: this batch's snapshot is already on the
      // trail — idempotent no-op (our staged data files are
      // manifest-unreferenced garbage; drop them now)
      fs.delete(new HPath(s"$root/$dataSubdir"), true)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new HPath(root).getFileSystem(GraftLake.hadoopConf)
    fs.delete(new HPath(s"$root/$dataSubdir"), true)
  }
}

/** OPTIMIZE as a CONCURRENT committer (q538/q539, block 98): fold the
  * files of the snapshot it read into a fresh zone-sorted layout and
  * commit the swap through the same claim protocol as appends — and,
  * like Iceberg's RewriteFiles, survive RACING appenders: the rewrite
  * replaces exactly the FILES IT READ; a lost version claim recomputes
  * the manifest against the new latest (keeping the racer's appended
  * lines verbatim) without re-writing any data. Data is written once;
  * only the metadata swap retries.
  */
private[graft] object LakeMaintain {

  /** Returns true when this call committed the fold; false when the
    * table was empty or `batchId` already committed (replay).
    */
  def optimize(spark: SparkSession, root: String, batchId: String,
      rowsPerFile: Long = 256L): Boolean = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val fs = new HPath(root).getFileSystem(GraftLake.hadoopConf)
    val baseVs = GraftLake.committedVersions(fs, root)
    val base = GraftLake.readMeta(root, baseVs.lastOption)
    if (base.files.isEmpty) return false
    require(base.files.forall(_.dvPath.isEmpty),
      "graft-lake: concurrent optimize handles DV-free tables " +
        "(DV folding goes through the single-writer OPTIMIZE)")
    val fPaths = base.files.map(_.path).toSet
    // rewrite the read snapshot's rows: zone-sorted uniform files.
    // The exact-rank window is the fixture's determinism, as in every
    // layout family (class (a) of the window boundary).
    val rd = spark.read.format(classOf[LakeTableProvider].getName)
      .option("path", root)
    val df = (baseVs.lastOption match {
      case Some(v) => rd.option("versionAsOf", v.toString)
      case None    => rd
    }).load()
    val sortCols = base.zoneCols.toSeq.map(col)
    val filed = df
      .withColumn("rn",
        row_number().over(Window.orderBy(sortCols: _*)).cast("long"))
      .withColumn("file_id", expr(s"(rn - 1L) div ${rowsPerFile}L"))
      .drop("rn")
    val subdir = s"data_o${UUID.randomUUID.toString.take(12)}"
    val written = GraftLake.writeFiles(spark, fs, root, subdir, filed,
      base.zoneCols.toSeq, base.bloomCol)
    val header = s"#schema\t${base.schema.fields.map(f =>
      s"${f.name}:${LakeEncode.typeName(f.dataType)}").mkString(",")
      }\t${base.zoneCols.mkString(",")}\t${base.bloomCol.getOrElse("-")}"
    val committed = LakeCommit.claim(fs, root, batchId,
      (latestV, _, seen, nextV) => {
        // keep every line the rewrite did NOT read (racing appends
        // ride verbatim); renumber the rewrite's manifest ids into a
        // fresh range (paths are opaque — the id is only a
        // plan-order key)
        val kept = GraftLake.rawFileLines(fs, root, latestV)
          .filterNot(l => fPaths.contains(l.split('\t')(1)))
        val maxId = (kept.map(_.split('\t')(0).toLong) ++ Seq(-1L)).max
        val renumbered = written.zipWithIndex.map { case (l, i) =>
          val f = l.split('\t')
          ((maxId + 1 + i).toString +: f.tail).mkString("\t")
        }
        (Seq(header, LakeCommit.propsLine(batchId, nextV, seen)) ++
          kept ++ renumbered).mkString("", "\n", "\n")
      })
    if (committed.isEmpty)
      fs.delete(new HPath(s"$root/$subdir"), true)
    committed.isDefined
  }
}

/** MERGE INTO on the lake format (block 104, q548/q549): Delta-style
  * copy-on-write upsert. Semantics: a source row whose key EXISTS in
  * the target replaces that row; an absent key inserts. Protocol:
  *
  *  1. CANDIDATE files — the distinct source keys join the broadcast
  *     manifest (metadata-sized): a file is a candidate iff its key
  *     zone admits ≥1 source key AND, when the key column carries a
  *     bloom, the bitmap admits it (the same integer arithmetic the
  *     planner and the oracle use). At 100 TB this is the step that
  *     keeps a point-ish merge from rewriting the table: only
  *     key-overlapping files are even READ.
  *  2. TOUCHED files — candidates are scanned and only files with an
  *     ACTUAL key match rewrite (a bloom/zone false positive costs a
  *     read, never a rewrite — Delta's find-touched-files scan).
  *  3. REWRITE — touched rows with matches replaced by their source
  *     rows, unioned with the true inserts (keys absent from the
  *     whole table), re-filed key-sorted; untouched files ride
  *     verbatim. Commit through [[LakeCommit.claim]], batch-id
  *     idempotent, racing appends kept by path like OPTIMIZE.
  *
  * Reference anchor: the K1–K3 `INSERT ... ON CONFLICT DO UPDATE`
  * upsert (`controller.js:64-79`) re-expressed as a table-format
  * commit instead of a row-at-a-time statement.
  */
private[graft] object LakeMerge {

  /** Returns (filesRewritten, filesNew, committedVersion), or None
    * when `batchId` already committed (idempotent replay).
    */
  def merge(spark: SparkSession, root: String,
      source: org.apache.spark.sql.DataFrame, keyCol: String,
      batchId: String): Option[(Long, Long, Long)] = {
    import org.apache.spark.sql.functions._
    val fs = new HPath(root).getFileSystem(GraftLake.hadoopConf)
    val baseVs = GraftLake.committedVersions(fs, root)
    val base = GraftLake.readMeta(root, baseVs.lastOption)
    if (LakeCommit.seenIds(base).contains(batchId)) return None
    require(base.files.forall(_.dvPath.isEmpty),
      "graft-lake: merge handles DV-free tables (fold DVs first)")
    require(base.zoneCols.contains(keyCol),
      s"graft-lake: merge key $keyCol must be a zone column")
    require(base.partSpec.isEmpty,
      "graft-lake: merge into a declared-partition table is not " +
        "supported yet")
    val zi = base.zoneCols.indexOf(keyCol)
    import spark.implicits._
    val filesDf = base.files
      .map(f => (f.fileId, f.path, f.zMin(zi), f.zMax(zi),
        f.bloom.toSeq))
      .toDF("file_id", "path", "zmin", "zmax", "bloom")
    val keys = source.select(col(keyCol).cast("long").as("mk"))
      .distinct()
    // candidate admission, DISTRIBUTED: every key probes the
    // broadcast manifest exactly like the planner would
    val bloomed = base.bloomCol.contains(keyCol)
    val admit = if (!bloomed) lit(true)
      else LakeBloom.Hashes.map { case (a, b) =>
        expr(s"(element_at(bloom, cast((((mk * ${a}L + ${b}L) % " +
          s"${LakeBloom.P}L) % ${LakeBloom.Bits}L) div 64 as int) + 1)" +
          s" & shiftleft(cast(1 as bigint), cast((((mk * ${a}L + " +
          s"${b}L) % ${LakeBloom.P}L) % ${LakeBloom.Bits}L) % 64 " +
          "as int))) != 0")
      }.reduce(_ && _)
    val candPaths = keys
      .join(broadcast(filesDf),
        col("mk") >= col("zmin") && col("mk") <= col("zmax"))
      .filter(admit)
      .select(col("path")).distinct()
      .as[String].collect().sorted
    val schema = base.schema
    val dataCols = schema.fieldNames.toSeq
    // which candidates actually MATCH (and the full candidate rows,
    // read once into the rewrite)
    val candRows = if (candPaths.isEmpty)
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    else spark.read.schema(schema)
      .parquet(candPaths.map(p => s"$root/$p"): _*)
      .withColumn("_src", input_file_name())
    val touchedPaths: Set[String] = if (candPaths.isEmpty) Set.empty
    else candRows
      .join(keys, col(keyCol) === col("mk"))
      .select(col("_src")).distinct().as[String].collect()
      .map(abs => candPaths.find(p => abs.endsWith(p)).getOrElse(
        sys.error(s"graft-lake: unmatched scan path $abs")))
      .toSet
    // rows of touched files only (candidates without a match ride
    // untouched)
    val touchedRows = if (touchedPaths.isEmpty)
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    else spark.read.schema(schema)
      .parquet(touchedPaths.toSeq.sorted.map(p => s"$root/$p"): _*)
    val tableKeys = candRows match {
      case _ if candPaths.isEmpty => keys.limit(0)
      case cr => cr.select(col(keyCol).cast("long").as("mk"))
        .join(keys, "mk").distinct()
    }
    val updates = source.join(tableKeys,
      source(keyCol).cast("long") === col("mk"))
      .select(dataCols.map(source(_)): _*)
    val inserts = source.join(tableKeys,
      source(keyCol).cast("long") === col("mk"), "left_anti")
      .select(dataCols.map(source(_)): _*)
    val rewritten = touchedRows
      .join(keys, touchedRows(keyCol).cast("long") === col("mk"),
        "left_anti")
      .select(dataCols.map(touchedRows(_)): _*)
      .unionAll(updates).unionAll(inserts)
    // re-file key-sorted (the fixtures' deterministic 256-row cut —
    // exact-rank layout machinery, a commit-time maintenance cost)
    val filed = {
      import org.apache.spark.sql.expressions.Window
      rewritten
        .withColumn("rn", row_number()
          .over(Window.orderBy(col(keyCol))).cast("long"))
        .withColumn("file_id", expr("(rn - 1L) div 256L"))
        .drop("rn")
    }
    val subdir = s"data_m${UUID.randomUUID.toString.take(12)}"
    val written = GraftLake.writeFiles(spark, fs, root, subdir, filed,
      base.zoneCols.toSeq, base.bloomCol)
    val header = s"#schema\t${base.schema.fields.map(f =>
      s"${f.name}:${LakeEncode.typeName(f.dataType)}").mkString(",")
      }\t${base.zoneCols.mkString(",")}\t${base.bloomCol.getOrElse("-")}"
    val committed = LakeCommit.claim(fs, root, batchId,
      (latestV, _, seen, nextV) => {
        val kept = GraftLake.rawFileLines(fs, root, latestV)
          .filterNot(l => touchedPaths.contains(l.split('\t')(1)))
        val maxId = (kept.map(_.split('\t')(0).toLong) ++ Seq(-1L)).max
        val renumbered = written.zipWithIndex.map { case (l, i) =>
          val f = l.split('\t')
          ((maxId + 1 + i).toString +: f.tail).mkString("\t")
        }
        (Seq(header, LakeCommit.propsLine(batchId, nextV, seen)) ++
          kept ++ renumbered).mkString("", "\n", "\n")
      })
    if (committed.isEmpty) {
      fs.delete(new HPath(s"$root/$subdir"), true)
      None
    } else Some((touchedPaths.size.toLong, written.size.toLong,
      committed.get))
  }
}

/** DELETE FROM on the lake format (block 110, q560/q561): a
  * predicate delete commits as MERGE-ON-READ positional deletion
  * vectors — no data file is rewritten; the touched manifest lines
  * gain (or extend) a DV pointer and the masked count. Protocol:
  *
  *  1. CANDIDATES — files whose zone for the predicate column
  *     overlaps the range (the planner's own admission);
  *  2. per candidate, the column is scanned in STORED order on a
  *     bounded pool and matching row ordinals collected — the same
  *     ordinal domain the reader masks;
  *  3. commit through [[LakeCommit.claim]]: each touched line's DV
  *     becomes the UNION of its current vector (re-read inside the
  *     claim body, so a racing deleter's masks survive) and the new
  *     matches; files with nothing newly masked ride verbatim.
  *
  * Deletes surface immediately in reads (the DV-aware row reader),
  * keep time travel intact (old snapshots keep old vectors), and
  * fold away at the next OPTIMIZE. Reference anchor: the chunked
  * DELETE loop (M1/M2, `maintenance.js:20-33`) as a metadata commit
  * instead of row-at-a-time statements.
  */
private[graft] object LakeDelete {

  /** Delete rows with `colName` ∈ [lo, hi]. Returns (filesTouched,
    * rowsNewlyMasked, version), or None when `batchId` already
    * committed (idempotent replay).
    */
  def deleteRange(spark: SparkSession, root: String, colName: String,
      lo: Long, hi: Long, batchId: String): Option[(Long, Long, Long)] = {
    val fs = new HPath(root).getFileSystem(GraftLake.hadoopConf)
    val baseVs = GraftLake.committedVersions(fs, root)
    val base = GraftLake.readMeta(root, baseVs.lastOption)
    if (LakeCommit.seenIds(base).contains(batchId)) return None
    require(base.zoneCols.contains(colName),
      s"graft-lake: delete predicate column $colName must be a " +
        "zone column")
    val zi = base.zoneCols.indexOf(colName)
    val cands = base.files
      .filter(f => f.zMax(zi) >= lo && f.zMin(zi) <= hi)
    // matched ordinals per candidate path, scanned on a bounded pool
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    val matched: Map[String, Array[Long]] = try {
      val futures = cands.map { f =>
        (f.path, pool.submit(
          new java.util.concurrent.Callable[Array[Long]] {
            override def call(): Array[Long] = {
              val hits = scala.collection.mutable.ArrayBuffer
                .empty[Long]
              var i = 0L
              GraftLake.scanKeys(s"$root/${f.path}", colName)
                .foreach { v =>
                  if (v >= lo && v <= hi) hits += i
                  i += 1
                }
              hits.toArray
            }
          }))
      }
      futures.map { case (p, fu) =>
        p -> fu.get(600, java.util.concurrent.TimeUnit.SECONDS)
      }.toMap
    } finally pool.shutdownNow()
    val dvDir = s"dv_${batchId}"

    def readDvLines(rel: String): Array[Long] = {
      val in = fs.open(new HPath(s"$root/$rel"))
      val body = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString finally in.close()
      body.split('\n').iterator.filter(_.nonEmpty).map(_.toLong)
        .toArray
    }

    var touched = 0L
    var masked = 0L
    val committed = LakeCommit.claim(fs, root, batchId,
      (latestV, _, seen, nextV) => {
        touched = 0L
        masked = 0L
        val header = GraftLake.rawHeaderLine(fs, root, latestV)
        val lines = GraftLake.rawFileLines(fs, root, latestV).map {
          line =>
            val f = line.split('\t')
            matched.get(f(1)).filter(_.nonEmpty) match {
              case Some(hits) =>
                // union with the line's CURRENT vector (a racing
                // deleter's masks survive the recompute)
                val cur = if (f.length > 6 && f(6) != "-")
                  readDvLines(f(6)) else Array.empty[Long]
                val merged = (cur ++ hits).distinct.sorted
                if (merged.length == cur.length) line
                else {
                  touched += 1
                  masked += merged.length - cur.length
                  val dvRel = s"$dvDir/file_${f(0)}.tsv"
                  GraftLake.writeText(fs, s"$root/$dvRel",
                    merged.mkString("", "\n", "\n"))
                  (f.take(6) ++ Array(dvRel, merged.length.toString) ++
                    f.drop(8)).mkString("\t")
                }
              case None => line
            }
        }
        (Seq(header, LakeCommit.propsLine(batchId, nextV, seen)) ++
          lines).mkString("", "\n", "\n")
      })
    if (committed.isEmpty) {
      fs.delete(new HPath(s"$root/$dvDir"), true)
      None
    } else Some((touched, masked, committed.get))
  }
}

private[lake] class LakeWriterFactory(dataDir: String,
    schema: StructType, zoneCols: Array[String],
    bloomCol: Option[String], partSpec: Option[LakePartSpec],
    hconf: SerializableHadoopConf)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new LakeDataWriter(dataDir, schema, zoneCols, bloomCol, partSpec,
      hconf.value, partitionId, taskId)
}

/** Executor-side file writer: streams InternalRows into one parquet
  * file through Spark's own ParquetWriteSupport, folding zone extrema
  * (in the manifest's ordered-long encoding) and bloom bits as rows
  * pass — the stats a real format's writer collects inline, so commit
  * needs no second scan. Task-id-suffixed file names keep retried or
  * speculative attempts from colliding; only COMMITTED messages reach
  * the manifest, the rest stay unreferenced and fall to GC.
  */
private[lake] class LakeDataWriter(dataDir: String, schema: StructType,
    zoneCols: Array[String], bloomCol: Option[String],
    partSpec: Option[LakePartSpec], conf: Configuration,
    partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private def fileName(seq: Int) =
    f"part-$partitionId%05d-$taskId-$seq%03d.parquet"

  /** Zone accessor per column: internal representations are already
    * ordered longs for long/timestamp (micros), ints for int/date
    * (days); decimal reads unscaled, double maps through the
    * total-order bits — identical to [[LakeEncode.toOrderedLong]] on
    * the external values.
    */
  private def encoderOf(dt: DataType): (InternalRow, Int) => Long =
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        (r, i) => r.getLong(i)
      case IntegerType | DateType => (r, i) => r.getInt(i).toLong
      case d: DecimalType if d.precision <= 18 =>
        (r, i) => r.getDecimal(i, d.precision, d.scale).toUnscaledLong
      case DoubleType =>
        (r, i) => LakeEncode.orderedBits(r.getDouble(i))
      case other => sys.error(
        s"graft-lake: type $other cannot be a zone column")
    }

  private val zoneIdx = zoneCols.map(c => schema.fieldIndex(c))
  private val zoneEnc = zoneIdx.map(i => encoderOf(schema(i).dataType))
  private val bloomIdx = bloomCol.map(schema.fieldIndex)
  // partition source accessor: the write REQUESTED rows clustered +
  // sorted by this column, so pval runs are contiguous and one file
  // per run keeps the one-pval-per-file invariant
  private val partIdx = partSpec.map(s => schema.fieldIndex(s.col))
  private val partEnc = partIdx.map(i => encoderOf(schema(i).dataType))
  private val partDt = partIdx.map(i => schema(i).dataType)

  private val zMin = Array.fill(zoneCols.length)(Long.MaxValue)
  private val zMax = Array.fill(zoneCols.length)(Long.MinValue)
  private var bloomWords = new Array[Long](LakeBloom.Words)
  private var nRows = 0L
  private var curPval: Option[Long] = None
  private var seq = 0
  private var writer: ParquetWriter[InternalRow] = _
  private val done = scala.collection.mutable.ArrayBuffer
    .empty[LakeFileStat]

  private def open(): Unit = {
    ParquetWriteSupport.setSchema(schema, conf)
    writer = new ParquetWriter[InternalRow](
      new HPath(s"$dataDir/${fileName(seq)}"),
      new ParquetWriteSupport(),
      CompressionCodecName.SNAPPY, ParquetWriter.DEFAULT_BLOCK_SIZE,
      ParquetWriter.DEFAULT_PAGE_SIZE, ParquetWriter.DEFAULT_PAGE_SIZE,
      true, false, ParquetWriter.DEFAULT_WRITER_VERSION, conf)
  }

  private def rollFile(): Unit = {
    if (writer != null) {
      writer.close()
      done += LakeFileStat(
        s"${new HPath(dataDir).getName}/${fileName(seq)}", nRows,
        zMin.clone(), zMax.clone(), bloomWords, curPval)
      writer = null
      seq += 1
      java.util.Arrays.fill(zMin, Long.MaxValue)
      java.util.Arrays.fill(zMax, Long.MinValue)
      bloomWords = new Array[Long](LakeBloom.Words)
      nRows = 0L
    }
  }

  override def write(row: InternalRow): Unit = {
    val pv = partEnc.map { enc =>
      val i = partIdx.get
      require(!row.isNullAt(i), s"graft-lake: partition column " +
        s"${partSpec.get.col} must be non-null")
      partSpec.get.pvalOf(partDt.get, enc(row, i))
    }
    if (writer != null && pv != curPval) rollFile()
    curPval = pv
    if (writer == null) open()
    var z = 0
    while (z < zoneIdx.length) {
      val i = zoneIdx(z)
      require(!row.isNullAt(i), s"graft-lake: zone column " +
        s"${zoneCols(z)} must be non-null")
      val e = zoneEnc(z)(row, i)
      if (e < zMin(z)) zMin(z) = e
      if (e > zMax(z)) zMax(z) = e
      z += 1
    }
    bloomIdx.foreach { i =>
      val k = schema(i).dataType match {
        case LongType => row.getLong(i)
        case _ => row.getInt(i).toLong
      }
      LakeBloom.positions(k).foreach { p =>
        bloomWords(p >> 6) |= 1L << (p & 63)
      }
    }
    writer.write(row)
    nRows += 1
  }

  override def commit(): WriterCommitMessage = {
    rollFile()
    LakeTaskStats(partitionId, done.toSeq)
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    val fs = new HPath(dataDir).getFileSystem(conf)
    (0 to seq).foreach { s =>
      fs.delete(new HPath(s"$dataDir/${fileName(s)}"), false)
    }
  }

  override def close(): Unit = ()
}
