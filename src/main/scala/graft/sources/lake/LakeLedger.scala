package graft.sources.lake

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.LongType

import graft.streaming.Provenance

/** ONE table abstraction (q543, block 101 — the r17 verdict's "unify
  * ledgers and the lake"): every versioned ledger is served THROUGH
  * [[LakeTableProvider]] by bridging its committed `b<v>_<batch>`
  * version dirs into lake manifests — `_commit_v<v>/manifest.tsv` at
  * the ledger root, one line per physical parquet file, with row
  * counts and long-column zone stats LIFTED FROM THE PARQUET FOOTERS
  * (metadata reads; no data scan, no rewrite). The ledger's own
  * commit protocol is untouched; underscore manifests are invisible
  * to ledger listers, version numbers coincide, `versionAsOf` IS the
  * ledger version, and the snapshot props carry the source micro-batch
  * id. CDF `_changeset` sidecars stay readable beside the bridged
  * state — a snapshot with change metadata, exactly the Delta shape.
  *
  * The AS OF (q512/q513) and change-feed diff (q452) state reads go
  * through [[versionDf]], so their scans are lake scans — plan-audited
  * by LakeLedgerSpec — with footer zones giving the same file-skip
  * a native lake table gets.
  *
  * 100 TB: bridging cost is one footer read per NEW physical file,
  * once per version, cached on disk as the manifest; stale manifests
  * of vacuumed versions are dropped on the next ensure.
  */
object LakeLedger {

  /** Bridge every committed version of the ledger at `root` (and drop
    * manifests of vacuumed versions). Idempotent; per-version work
    * happens once.
    */
  def ensureBridged(spark: SparkSession, root: String): String =
    synchronized {
      val fs = new HPath(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val vs = Provenance.committedVersions(spark, root)
      require(vs.nonEmpty, s"no committed ledger versions under $root")
      val live = vs.map(_._1).toSet
      // drop bridges whose ledger version was vacuumed
      GraftLake.committedVersions(fs, root)
        .filterNot(live.contains)
        .foreach(v => fs.delete(new HPath(s"$root/_commit_v$v"), true))
      vs.foreach { case (v, b, path) =>
        val dest = new HPath(s"$root/_commit_v$v")
        if (!fs.exists(dest)) {
          val schema = spark.read.parquet(path).schema
          val dataFiles = fs.listStatus(new HPath(path))
            .filter(st => !st.isDirectory &&
              st.getPath.getName.endsWith(".parquet"))
            .sortBy(_.getPath.getName)
          val candidates = schema.fields
            .filter(_.dataType == LongType).map(_.name).toSeq
          val perFile = dataFiles.map(st =>
            footerStats(spark, st, candidates))
          // zone cols = long columns with footer stats in EVERY file
          val zoneCols = candidates.filter(c =>
            perFile.forall(_._2.contains(c)))
          val header = s"#schema\t${schema.fields.map(f =>
            s"${f.name}:${LakeEncode.typeName(f.dataType)}")
            .mkString(",")}\t${zoneCols.mkString(",")}\t-"
          val props = s"#props\tbatch_id=ledger-b$b\tversion=$v"
          val rel = new HPath(path).getName
          val lines = dataFiles.zip(perFile).zipWithIndex.map {
            case ((st, (n, stats)), i) =>
              val zmins =
                if (zoneCols.isEmpty) "-"
                else zoneCols.map(c => stats(c)._1).mkString(",")
              val zmaxs =
                if (zoneCols.isEmpty) "-"
                else zoneCols.map(c => stats(c)._2).mkString(",")
              s"$i\t$rel/${st.getPath.getName}\t$n\t$zmins\t$zmaxs" +
                "\t-\t-\t0"
          }
          val staging = s"$root/_staging_c_bridge_v$v"
          fs.delete(new HPath(staging), true)
          val out = fs.create(new HPath(s"$staging/manifest.tsv"), true)
          try out.write((Seq(header, props) ++ lines)
            .mkString("", "\n", "\n").getBytes("UTF-8"))
          finally out.close()
          if (!fs.rename(new HPath(staging), dest))
            fs.delete(new HPath(staging), true) // lost to a peer: fine
        }
      }
      root
    }

  /** (row count, per-column (min,max)) lifted from one file's footer —
    * a column is usable only when every row group carries non-null
    * long statistics.
    */
  private def footerStats(spark: SparkSession, st: FileStatus,
      cols: Seq[String]): (Long, Map[String, (Long, Long)]) = {
    val in = HadoopInputFile.fromStatus(st,
      spark.sparkContext.hadoopConfiguration)
    val reader = ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val n = blocks.map(_.getRowCount).sum
      val stats = cols.flatMap { c =>
        val perBlock = blocks.map(b => b.getColumns.asScala
          .find(_.getPath.toDotString == c).map(_.getStatistics))
        if (perBlock.exists(s => s.isEmpty || s.get == null ||
            s.get.isEmpty || !s.get.hasNonNullValue)) None
        else {
          val mins = perBlock.map(_.get.genericGetMin
            .asInstanceOf[java.lang.Long].longValue)
          val maxs = perBlock.map(_.get.genericGetMax
            .asInstanceOf[java.lang.Long].longValue)
          Some(c -> (mins.min, maxs.max))
        }
      }.toMap
      (n, stats)
    } finally reader.close()
  }

  /** One committed ledger version THROUGH the lake provider. */
  def versionDf(spark: SparkSession, root: String,
      version: Long): DataFrame = {
    ensureBridged(spark, root)
    spark.read.format(classOf[LakeTableProvider].getName)
      .option("path", root).option("versionAsOf", version.toString)
      .load()
  }

  /** q543: the registry ledger's HEAD served through the provider —
    * the bridged scan's content hash-matched against DuckDB over raw
    * documents (the drained registry head is the full corpus, per
    * source). One bridged file lost or doubled breaks it.
    */
  def lakeLedgerHead(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val root = graft.streaming.Erasure.registryLedgerShared(spark, dir)
    val vmax = Provenance.committedVersions(spark, root).map(_._1).max
    versionDf(spark, root, vmax)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"))
      .orderBy(col("source"))
  }
}
