package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multi-table atomic commit (q450–q451, block 48): one transaction
  * spanning TWO versioned ledgers, made visible by a single manifest
  * pointer — the cross-table atomicity single-table formats
  * (Delta/Iceberg per-table logs) famously lack and warehouse ETL
  * constantly needs (fact + aggregate, data + index, corpus + its
  * dup-edge artifact must move together or not at all).
  *
  * Protocol: per transaction, every member table's next version is
  * written UNCOMMITTED-BY-ITSELF (the familiar `b<v>_<batch>` dirs —
  * but readers of this root never trust them directly); then ONE
  * manifest `m<k>` listing `(table, version)` pairs is staged and
  * renamed into place. The rename is the commit point for ALL tables
  * at once. A reader resolves the latest committed manifest and reads
  * exactly the versions it names — so a crash after table A's version
  * write but before the manifest leaves every reader on the old
  * manifest seeing the old A AND the old B: no torn snapshot, ever.
  * Recovery is forward-only: finish the remaining version writes and
  * commit the manifest (versions are deterministic rewrites, so
  * re-running the transaction is idempotent).
  *
  * Fixture schedule: txn 0 folds the first two id-range batches of
  * orders into both tables (per-custkey counts; per-priority counts)
  * and commits manifest m0. Txn 1 folds batch 2: table `cnt`'s v1 is
  * written, then the process CRASHES (simulated) before the manifest
  * — q451 reads through the manifest at exactly this point and must
  * see BOTH tables at v0 (the half-written v1 invisible). Recovery
  * completes `pri`'s v1 and commits m1; q450 is the post-recovery
  * manifest trail with per-version row counts.
  *
  * Reference anchor: the reference's run-etl writes contacts to pg
  * AND refreshes the Redis view as two separate unguarded steps
  * (`controller.js` / `preloadRedis.js`) — a crash between them
  * serves stale lookups against new rows. This protocol is that same
  * pair of writes made atomic.
  *
  * 100 TB shape: the manifest is metadata (bytes); version writes are
  * the rewrites the tables needed anyway; the commit adds one rename.
  * Readers pay one small parquet read to resolve versions.
  */
object MultiTable {

  /** Write `df` as manifest `m<k>` (staged + renamed — atomic). */
  private def commitManifest(spark: SparkSession, root: String,
      k: Long, entries: Seq[(String, Long)]): Unit = {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dest = s"$root/_txn/m$k"
    val staging = s"${dest}_staging"
    entries.toDF("table_name", "version")
      .coalesce(1).write.mode("overwrite").parquet(staging)
    // idempotent: a retrying recoverer finding m<k> already committed
    // (its own prior success, or a racing recoverer's) is done
    if (fs.exists(new Path(dest))) { fs.delete(new Path(staging), true) }
    else if (!fs.rename(new Path(staging), new Path(dest)))
      sys.error(s"manifest commit failed: rename($staging -> $dest)")
  }

  /** Latest committed manifest: (k, Map(table -> version)), or None
    * before the first commit.
    */
  private[graft] def latestManifest(spark: SparkSession,
      root: String): Option[(Long, Map[String, Long])] = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(s"$root/_txn")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return None
    val ks = fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("m") && !n.endsWith("_staging"))
      .flatMap(_.drop(1).toLongOption)
    ks.maxOption.map { k =>
      val m = spark.read.parquet(s"$root/_txn/m$k").collect()
        .map(r => r.getAs[String]("table_name") ->
          r.getAs[Long]("version")).toMap
      (k, m)
    }
  }

  /** Read one member table THROUGH the manifest — the only sanctioned
    * read path for this root.
    */
  private[graft] def readTable(spark: SparkSession, root: String,
      table: String): DataFrame = {
    val (_, m) = latestManifest(spark, root).getOrElse(
      sys.error(s"no committed manifest under $root"))
    val v = m.getOrElse(table,
      sys.error(s"table $table not in manifest"))
    spark.read.parquet(s"$root/$table/b${v}_$v")
  }

  private def batchedOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.read(spark, dir, "orders")
      .select(col("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"),
        col("o_orderpriority"))
    val step = o.agg(expr("(max(o_orderkey) + 3L) div 3L").as("step"))
    o.crossJoin(broadcast(step))
      .withColumn("batch_id", expr("o_orderkey div step"))
      .drop("step")
  }

  private def cntState(rows: DataFrame): DataFrame =
    rows.groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("n_orders"))

  private def priState(rows: DataFrame): DataFrame =
    rows.groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"))

  /** Run the schedule up to (and including) the simulated crash:
    * txn 0 committed over batches 0–1; txn 1's `cnt` v1 written, no
    * manifest. Returns the root.
    */
  private[graft] def runToCrash(spark: SparkSession,
      dir: String): String = {
    val root = graft.Caches.trackTempDir(
      Files.createTempDirectory("graft_mtx_")).toString
    val o = batchedOrders(spark, dir).persist()
    val base = o.filter(col("batch_id") <= 1)
    // the two member-table version writes are independent jobs —
    // overlap them (guide §2.6); the manifest commit stays the single
    // ordered commit point
    graft.operators.Par.seq(Seq(
      () => cntState(base).write.mode("overwrite")
        .parquet(s"$root/cnt/b0_0"),
      () => priState(base).write.mode("overwrite")
        .parquet(s"$root/pri/b0_0")))(_.apply())
    commitManifest(spark, root, 0L, Seq("cnt" -> 0L, "pri" -> 0L))
    // txn 1: cnt's v1 lands, then the process dies before pri/manifest
    cntState(o).write.mode("overwrite").parquet(s"$root/cnt/b1_1")
    root
  }

  /** Forward recovery + commit of txn 1 (idempotent: rewrites are
    * deterministic folds of the full input).
    */
  private[graft] def recover(spark: SparkSession, dir: String,
      root: String): Unit = {
    val o = batchedOrders(spark, dir).persist()
    graft.operators.Par.seq(Seq(
      () => cntState(o).write.mode("overwrite")
        .parquet(s"$root/cnt/b1_1"),
      () => priState(o).write.mode("overwrite")
        .parquet(s"$root/pri/b1_1")))(_.apply())
    commitManifest(spark, root, 1L, Seq("cnt" -> 1L, "pri" -> 1L))
  }

  /** q450: the post-recovery manifest trail — per committed
    * transaction and member table, the version it pinned and that
    * version's row count. The cross-table commit history a regulator
    * (or a debugging engineer) reads.
    */
  def multitableManifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = runToCrash(spark, dir)
    recover(spark, dir, root)
    val trail = for {
      k <- Seq(0L, 1L)
      t <- Seq("cnt", "pri")
    } yield {
      val m = spark.read.parquet(s"$root/_txn/m$k").collect()
        .map(r => r.getAs[String]("table_name") ->
          r.getAs[Long]("version")).toMap
      val v = m(t)
      val n = spark.read.parquet(s"$root/$t/b${v}_$v").count()
      (k, t, v, n)
    }
    trail.toDF("txn_id", "table_name", "version", "n_rows")
      .orderBy(col("txn_id"), col("table_name"))
  }

  // ---------------------------------------------------------------
  // multi-table branch + atomic merge (q501–q502, block 75)
  // ---------------------------------------------------------------

  /** The cross-table rehearsal: branch BOTH member tables (zero-copy
    * [[ShallowClone]]s of each version trail), apply one coordinated
    * change on the branches — the %97 customer erasure, which must
    * move `cnt` (keys dropped) and `pri` (masses decremented)
    * TOGETHER or not at all — and return
    * (root, fork txn id, cnt clone, pri clone).
    */
  private def multiBranchRehearsal(spark: SparkSession,
      dir: String): (String, Long, String, String) = {
    val root = runToCrash(spark, dir)
    recover(spark, dir, root)
    val (forkTxn, _) = latestManifest(spark, root).get
    val retained = batchedOrders(spark, dir)
      .filter(col("o_custkey") % 97 =!= 0).persist()
    // the two branch rehearsals are independent — overlap them
    val Seq(cloneCnt, clonePri) = graft.operators.Par.seq(Seq(
      () => {
        val c = ShallowClone.clone(spark, s"$root/cnt")
        ShallowClone.commitOwned(spark, c, cntState(retained))
        c
      },
      () => {
        val c = ShallowClone.clone(spark, s"$root/pri")
        ShallowClone.commitOwned(spark, c, priState(retained))
        c
      }))(_.apply())
    (root, forkTxn, cloneCnt, clonePri)
  }

  /** Atomically merge both branches back: write each table's next
    * version from its clone head, then commit ONE manifest — the
    * rename is the commit point for the WHOLE cross-table merge. A
    * manifest that moved past the fork aborts the merge (the branch
    * rehearsed against a stale snapshot); a crash after the version
    * writes but before the manifest leaves every reader on the fork
    * manifest seeing BOTH pre-merge tables (q502 pins exactly that
    * point).
    */
  private[graft] def mergeBranches(spark: SparkSession, root: String,
      forkTxn: Long, cloneCnt: String, clonePri: String,
      commitTheManifest: Boolean): String = {
    val (curTxn, _) = latestManifest(spark, root).get
    if (curTxn != forkTxn)
      return "aborted" // the source committed past the fork
    val next = forkTxn + 1L
    graft.operators.Par.seq(Seq(
      () => spark.read.parquet(ShallowClone.headPath(spark, cloneCnt))
        .write.mode("overwrite").parquet(s"$root/cnt/b${next}_$next"),
      () => spark.read.parquet(ShallowClone.headPath(spark, clonePri))
        .write.mode("overwrite")
        .parquet(s"$root/pri/b${next}_$next")))(_.apply())
    if (!commitTheManifest) return "crashed_before_manifest"
    commitManifest(spark, root, next,
      Seq("cnt" -> next, "pri" -> next))
    "merged"
  }

  /** q501: the multi-table merge audit — per member table, the fork
    * and merged transaction ids with row counts and masses on both
    * sides. The coordinated change lands in ONE commit: cnt loses the
    * %97 keys, pri keeps its 5 priorities but sheds exactly the
    * erased customers' order mass, and both tables cite the same
    * merged txn.
    */
  def multiBranchMergeAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (root, forkTxn, cc, cp) = multiBranchRehearsal(spark, dir)
    val outcome = mergeBranches(spark, root, forkTxn, cc, cp,
      commitTheManifest = true)
    require(outcome == "merged", s"fixture merge $outcome")
    val (mergedTxn, _) = latestManifest(spark, root).get
    graft.operators.Par.seq(Seq("cnt", "pri")) { t =>
      val fork = spark.read.parquet(s"$root/$t/b${forkTxn}_$forkTxn")
      val merged = readTable(spark, root, t)
      def cm(df: DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)), sum(col("n_orders"))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val (fr, fm) = cm(fork)
      val (mr, mm) = cm(merged)
      (t, forkTxn, mergedTxn, fr, mr, fm, mm)
    }.toDF("table_name", "fork_txn", "merged_txn", "n_rows_fork",
        "n_rows_merged", "mass_fork", "mass_merged")
      .orderBy(col("table_name"))
  }

  /** q502: the torn-merge guard — the merge's version writes land but
    * the process dies BEFORE the manifest; reading through the
    * manifest must still see BOTH tables at the fork state (the q451
    * invariant at merge time). One table answering from the
    * half-merged versions breaks the oracle hash.
    */
  def multiBranchTornRead(spark: SparkSession, dir: String): DataFrame = {
    val (root, forkTxn, cc, cp) = multiBranchRehearsal(spark, dir)
    val outcome = mergeBranches(spark, root, forkTxn, cc, cp,
      commitTheManifest = false)
    require(outcome == "crashed_before_manifest", s"fixture $outcome")
    val cnt = readTable(spark, root, "cnt")
      .agg(count(lit(1)).as("n_keys"), sum(col("n_orders")).as("mass"))
      .select(lit("cnt").as("table_name"), col("n_keys"), col("mass"))
    val pri = readTable(spark, root, "pri")
      .agg(count(lit(1)).as("n_keys"), sum(col("n_orders")).as("mass"))
      .select(lit("pri").as("table_name"), col("n_keys"), col("mass"))
    cnt.unionByName(pri).orderBy(col("table_name"))
  }

  /** q451: the torn-read test as a query — read BOTH tables through
    * the manifest at the crash point (cnt's v1 on disk, manifest
    * still m0) and emit each table's census. Atomicity means both
    * tables answer from v0: the counts must equal the batch-0–1
    * aggregates, not the full-input fold sitting uncommitted beside
    * them. One torn row and the oracle hash breaks.
    */
  def multitableSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val root = runToCrash(spark, dir)
    val cnt = readTable(spark, root, "cnt")
      .agg(count(lit(1)).as("n_keys"), sum(col("n_orders")).as("mass"))
      .select(lit("cnt").as("table_name"), col("n_keys"), col("mass"))
    val pri = readTable(spark, root, "pri")
      .agg(count(lit(1)).as("n_keys"), sum(col("n_orders")).as("mass"))
      .select(lit("pri").as("table_name"), col("n_keys"), col("mass"))
    cnt.unionByName(pri).orderBy(col("table_name"))
  }
}
