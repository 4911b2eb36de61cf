package graft.sources.lake

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ZoneMap
import graft.streaming.LedgerArtifacts

/** VACUUM for crash debris on the lake format (block 112,
  * q564/q565): every writer failure mode leaves only
  * manifest-unreferenced garbage — uuid-named data files from killed
  * executors/speculative retries, whole `data_u*` dirs from a driver
  * that died before commit, `_staging_c_*` commit dirs from a lost
  * claim — and this sweep retires it. Classification is
  * conservative:
  *
  *  - REFERENCED: any file named by ANY committed snapshot's
  *    manifest (data or DV) — never touched, whatever its age
  *    (time travel keeps old snapshots readable until
  *    `expireSnapshots` retires them — a different, versioned
  *    operation);
  *  - COMMITTED METADATA: `_commit_v*`, `_manifest*`, `_meta.tsv` —
  *    never touched;
  *  - DEBRIS: everything else (unreferenced data files, staging
  *    dirs) older than `minAgeMs` — deleted. The age floor is the
  *    standard in-flight-writer guard: a writer that has staged
  *    files but not yet committed is younger than the floor.
  *
  * File-grain, not dir-grain: a committed append's `data_u*` dir can
  * hold BOTH referenced files and a killed speculative attempt's
  * orphans — the sweep removes only the orphans. 100 TB shape: the
  * referenced set is manifest-derived (metadata-sized); the walk is
  * one listing pass.
  */
private[graft] object LakeVacuum {

  /** Sweep debris older than `minAgeMs`. Returns
    * (filesSwept, dirsSwept, filesKeptReferenced).
    */
  def sweepOrphans(spark: SparkSession, root: String,
      minAgeMs: Long = 0L): (Long, Long, Long) = {
    val fs = new HPath(root).getFileSystem(GraftLake.hadoopConf)
    val referenced: Set[String] =
      GraftLake.committedVersions(fs, root)
        .flatMap(v => GraftLake.readMeta(root, Some(v)).files
          .flatMap(f => f.path +: f.dvPath.toSeq)).toSet
    val cutoff = System.currentTimeMillis() - minAgeMs

    def walk(p: HPath): Iterator[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).iterator.flatMap { st =>
        if (st.isDirectory) walk(st.getPath) else Iterator(st)
      }

    var swept = 0L
    var dirsSwept = 0L
    var kept = 0L
    val rootPath = new HPath(root)
    fs.listStatus(rootPath).foreach { top =>
      val name = top.getPath.getName
      val isMeta = name.startsWith("_commit_v") ||
        name.startsWith("_manifest") || name == "_meta.tsv"
      if (!isMeta) {
        if (top.isDirectory && name.startsWith("_staging_c_")) {
          // a lost claim's staging dir: debris wholesale
          if (top.getModificationTime < cutoff) {
            fs.delete(top.getPath, true)
            dirsSwept += 1
          }
        } else if (top.isDirectory) {
          // manifests store plain root-relative paths; normalize the
          // walked absolute URIs into that domain before matching
          val rootUri = fs.makeQualified(rootPath).toUri.getPath
          var keptInDir = false
          walk(top.getPath).foreach { st =>
            val rel = st.getPath.toUri.getPath
              .stripPrefix(rootUri).stripPrefix("/")
            if (referenced.contains(rel)) {
              kept += 1
              keptInDir = true
            } else if (st.getModificationTime < cutoff) {
              fs.delete(st.getPath, false)
              swept += 1
            } else keptInDir = true
          }
          if (!keptInDir && walk(top.getPath).isEmpty &&
              top.getModificationTime < cutoff) {
            fs.delete(top.getPath, true)
            dirsSwept += 1
          }
        }
      }
    }
    (swept, dirsSwept, kept)
  }

  /** The vacuumed instance: a fresh table with two committed
    * appends, then PLANTED crash debris — a killed speculative
    * attempt's orphan file inside a committed data dir, a whole
    * uncommitted `data_u*` dir, and a lost claim's `_staging_c_*`
    * dir — then the sweep. Built per corpus (fingerprint-fresh).
    */
  def ensureVacuumTable(spark: SparkSession, dir: String): String = {
    val o = ZoneMap.orders(spark, dir)
    val fp = LedgerArtifacts.fingerprint(o,
      Seq("o_orderkey", "o_custkey"))
    GraftLake.ensureLake(spark,
      s"lake2_vac_${LedgerArtifacts.dirKey(dir)}", fp) {
      (fs, staging) =>
        import org.apache.spark.sql.types._
        GraftLake.createTable(fs, staging, StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_custkey", LongType))),
          Seq("o_orderkey", "o_custkey"), Some("o_orderkey"))
        val maxOk = o.agg(max(col("o_orderkey"))).collect()(0)
          .getLong(0)
        val step = (maxOk + 2) / 2
        def append(i: Int): Unit = o
          .filter(col("o_orderkey") >= i * step &&
            col("o_orderkey") < (i + 1) * step)
          .repartition(3, col("o_orderkey"))
          .write.format(classOf[LakeTableProvider].getName)
          .option("path", staging).option("batchId", s"vac-$i")
          .mode("append").save()
        append(0)
        append(1)
        // plant the three failure modes' debris
        val committedDir = GraftLake.readMeta(staging).files.head
          .path.split('/').head
        GraftLake.writeText(fs,
          s"$staging/$committedDir/part-spec-retry.parquet", "junk")
        GraftLake.writeText(fs,
          s"$staging/data_udeadbeef0000/part-00000-1-000.parquet",
          "junk")
        GraftLake.writeText(fs,
          s"$staging/_staging_c_lostclaim/manifest.tsv", "junk")
        val (swept, dirs, kept) = sweepOrphans(spark, staging)
        // the sweep's outcome is pinned INTO the fixture: exactly the
        // planted debris goes, every referenced file stays
        require(swept == 2L && dirs >= 1L,
          s"vacuum fixture: expected the planted debris swept, " +
            s"got files=$swept dirs=$dirs")
        require(kept == GraftLake.readMeta(staging).files.size,
          "vacuum fixture: every referenced file must survive")
    }
  }

  /** q564: the vacuum audit — referenced files kept, both snapshots
    * still fully readable through the provider after the sweep, and
    * the version trail intact. DuckDB re-derives the per-snapshot
    * masses from the id-range batch layout.
    */
  def lakeVacuumAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = ensureVacuumTable(spark, dir)
    val fs = new HPath(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nVersions = GraftLake.committedVersions(fs, root)
      .length.toLong
    (1L to 2L).map { v =>
      val r = GraftLake.dfForAt(spark, root, Some(v))
        .agg(count(lit(1)), sum(col("o_orderkey"))).collect()(0)
      (v, r.getLong(0), r.getLong(1), nVersions)
    }.toDF("version", "n_rows", "sum_ok", "versions_committed")
      .orderBy(col("version"))
  }

  /** q565: the post-vacuum state — full-table bucket rollup through
    * the provider; a sweep that deleted one referenced byte breaks
    * the cross-engine hash.
    */
  def lakeVacuumState(spark: SparkSession, dir: String): DataFrame =
    GraftLake.dfFor(spark, ensureVacuumTable(spark, dir))
      .groupBy((col("o_custkey") % 8L).as("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_orderkey")).as("sum_ok"))
      .orderBy(col("bucket"))
}
