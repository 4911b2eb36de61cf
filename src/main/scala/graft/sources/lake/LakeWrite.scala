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

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val meta = GraftLake.readMeta(root)
      val got = info.schema()
      require(got.fields.map(f => (f.name, f.dataType)).toSeq ==
        meta.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"graft-lake: append schema ${got.simpleString} does not " +
          s"match table schema ${meta.schema.simpleString}")
      require(meta.partSpec.isEmpty,
        "graft-lake: DSv2 append to a declared-partition table is " +
          "not supported yet — partitioned tables commit through the " +
          "partition committer, which keeps one pval per file")
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

/** One per-file stats message — the only thing an executor sends the
  * driver (metadata-sized by construction).
  */
private[lake] final case class LakeFileStats(partitionId: Int,
    relPath: String, nRows: Long, zMin: Array[Long], zMax: Array[Long],
    bloom: Array[Long]) extends WriterCommitMessage

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
      meta.zoneCols, meta.bloomCol, new SerializableHadoopConf(conf))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new HPath(root).getFileSystem(GraftLake.hadoopConf)
    val stats = messages.collect {
      case m: LakeFileStats if m.nRows > 0 => m
    }.sortBy(_.partitionId)
    if (stats.isEmpty) {
      // an empty append commits nothing — keeps version counts free
      // of no-data micro-batches (a streaming sink's trailing batch)
      fs.delete(new HPath(s"$root/$dataSubdir"), true)
      return
    }
    var attempts = 0
    while (attempts < 64) {
      attempts += 1
      val latestVs = GraftLake.committedVersions(fs, root)
      val latest = GraftLake.readMeta(root,
        if (latestVs.nonEmpty) Some(latestVs.max) else None)
      // replay check against the CARRIED batch-id set, not just the
      // latest commit's own id: under concurrent writers a duplicate
      // submission can arrive arbitrarily many commits after its twin
      // landed (the lake race fixture exercises exactly this). The
      // set is capped — the documented retention window for retry
      // recognition, the same contract as per-app txn versions in a
      // real format's log.
      val seen = latest.props.get("batch_ids")
        .map(_.split(',').filter(_.nonEmpty).toSeq)
        .getOrElse(latest.props.get("batch_id")
          .filter(_ != "-").toSeq)
      if (seen.contains(batchId)) {
        // committed retry: this batch's snapshot is already on the
        // trail — idempotent no-op (our staged data files are
        // manifest-unreferenced garbage; drop them now)
        fs.delete(new HPath(s"$root/$dataSubdir"), true)
        return
      }
      val nextV = if (latestVs.nonEmpty) latestVs.max + 1 else 1L
      val nextFileId = (latest.files.map(_.fileId) ++ Seq(-1L)).max + 1
      val lines = stats.zipWithIndex.map { case (m, i) =>
        s"${nextFileId + i}\t${m.relPath}\t${m.nRows}" +
          s"\t${m.zMin.mkString(",")}\t${m.zMax.mkString(",")}" +
          s"\t${if (meta.bloomCol.isDefined) m.bloom.mkString(",")
            else "-"}\t-\t0"
      }
      val header = s"#schema\t${meta.schema.fields.map(f =>
        s"${f.name}:${LakeEncode.typeName(f.dataType)}").mkString(",")
        }\t${meta.zoneCols.mkString(",")}\t${meta.bloomCol.getOrElse("-")}"
      val props = s"#props\tbatch_id=$batchId\tversion=$nextV" +
        s"\tbatch_ids=${((seen :+ batchId).distinct.takeRight(256))
          .mkString(",")}"
      val existing = GraftLake.rawFileLines(fs, root, latestVs.lastOption)
      val body = (Seq(header, props) ++ existing ++ lines)
        .mkString("", "\n", "\n")
      val staging = s"$root/_staging_c_$writeUuid"
      fs.delete(new HPath(staging), true)
      val out = fs.create(new HPath(s"$staging/manifest.tsv"), true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      val dest = new HPath(s"$root/_commit_v$nextV")
      // the atomic claim + nested-ownership verify (Occ discipline)
      if (!fs.exists(dest) && fs.rename(new HPath(staging), dest)) {
        val nested = new HPath(dest, new HPath(staging).getName)
        if (!fs.exists(nested)) return // committed
        fs.delete(nested, true) // lost the race onto an extant dest
      } else fs.delete(new HPath(staging), true)
      // lost: another writer claimed nextV — recompute against it
    }
    sys.error(s"graft-lake: commit of batch $batchId to $root lost " +
      s"$attempts consecutive version claims — giving up")
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
    val stagingUuid = UUID.randomUUID.toString.take(12)
    var attempts = 0
    while (attempts < 64) {
      attempts += 1
      val latestVs = GraftLake.committedVersions(fs, root)
      val latest = GraftLake.readMeta(root, latestVs.lastOption)
      val seen = latest.props.get("batch_ids")
        .map(_.split(',').filter(_.nonEmpty).toSeq)
        .getOrElse(latest.props.get("batch_id").filter(_ != "-").toSeq)
      if (seen.contains(batchId)) {
        fs.delete(new HPath(s"$root/$subdir"), true)
        return false
      }
      val nextV = if (latestVs.nonEmpty) latestVs.max + 1 else 1L
      // keep every line the rewrite did NOT read (racing appends ride
      // verbatim); renumber the rewrite's manifest ids into a fresh
      // range (paths are opaque — the id is only a plan-order key)
      val kept = GraftLake.rawFileLines(fs, root, latestVs.lastOption)
        .filterNot(l => fPaths.contains(l.split('\t')(1)))
      val maxId = (kept.map(_.split('\t')(0).toLong) ++ Seq(-1L)).max
      val renumbered = written.zipWithIndex.map { case (l, i) =>
        val f = l.split('\t')
        ((maxId + 1 + i).toString +: f.tail).mkString("\t")
      }
      val props = s"#props\tbatch_id=$batchId\tversion=$nextV" +
        s"\tbatch_ids=${((seen :+ batchId).distinct.takeRight(256))
          .mkString(",")}"
      val body = (Seq(header, props) ++ kept ++ renumbered)
        .mkString("", "\n", "\n")
      val staging = s"$root/_staging_c_$stagingUuid"
      fs.delete(new HPath(staging), true)
      val out = fs.create(new HPath(s"$staging/manifest.tsv"), true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      val dest = new HPath(s"$root/_commit_v$nextV")
      if (!fs.exists(dest) && fs.rename(new HPath(staging), dest)) {
        val nested = new HPath(dest, new HPath(staging).getName)
        if (!fs.exists(nested)) return true
        fs.delete(nested, true)
      } else fs.delete(new HPath(staging), true)
    }
    sys.error(s"graft-lake: optimize of $root lost $attempts " +
      "consecutive version claims — giving up")
  }
}

private[lake] class LakeWriterFactory(dataDir: String,
    schema: StructType, zoneCols: Array[String],
    bloomCol: Option[String], hconf: SerializableHadoopConf)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new LakeDataWriter(dataDir, schema, zoneCols, bloomCol,
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
    conf: Configuration, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val fileName = f"part-$partitionId%05d-$taskId.parquet"

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
  private val zMin = Array.fill(zoneCols.length)(Long.MaxValue)
  private val zMax = Array.fill(zoneCols.length)(Long.MinValue)
  private val bloomWords = new Array[Long](LakeBloom.Words)
  private var nRows = 0L
  private var writer: ParquetWriter[InternalRow] = _

  override def write(row: InternalRow): Unit = {
    if (writer == null) {
      ParquetWriteSupport.setSchema(schema, conf)
      writer = new ParquetWriter[InternalRow](
        new HPath(s"$dataDir/$fileName"), new ParquetWriteSupport(),
        CompressionCodecName.SNAPPY, ParquetWriter.DEFAULT_BLOCK_SIZE,
        ParquetWriter.DEFAULT_PAGE_SIZE, ParquetWriter.DEFAULT_PAGE_SIZE,
        true, false, ParquetWriter.DEFAULT_WRITER_VERSION, conf)
    }
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
    if (writer != null) writer.close()
    LakeFileStats(partitionId,
      s"${new HPath(dataDir).getName}/$fileName", nRows, zMin, zMax,
      bloomWords)
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    val p = new HPath(s"$dataDir/$fileName")
    val fs = p.getFileSystem(conf)
    fs.delete(p, false)
  }

  override def close(): Unit = ()
}
