package graft

import org.apache.spark.sql.functions._

import graft.streaming.{SimulatedCrash, StreamState, StreamingOps}

/** Round-11 specs: crash-safe state-lifecycle (r10 verdict #1a / advice
  * #1), size-based compaction width (#3), compaction telemetry (#5),
  * durable stateRoot + checkpoint resume (#1b), and the id-ordered
  * arrival guard (advice #2).
  */
class Wave7Spec extends SparkSpec {

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def rmrf(p: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))

  /** A state table of `rows` distinct rows spread over `files` appends. */
  private def seedState(dir: String, rows: Int, files: Int): Unit = {
    import spark.implicits._
    (0 until files).foreach { f =>
      (0 until rows).filter(_ % files == f)
        .map(i => (i.toLong, s"payload$i"))
        .toDF("doc_id", "h")
        .coalesce(1).write.mode("append").parquet(dir)
    }
  }

  private def stateRows(dir: String): Set[Long] =
    spark.read.parquet(dir).select("doc_id").collect()
      .map(_.getLong(0)).toSet

  test("maybeCompact survives a kill at every swap step: recovery " +
    "leaves the full state visible to the next batch") {
    for (crashPoint <- Seq("write", "renameOld", "renameTmp")) {
      val root = tmpDir("graft_kill_")
      val dir = s"$root/state"
      try {
        seedState(dir, rows = 40, files = 8)
        val expected = stateRows(dir)
        intercept[SimulatedCrash] {
          StreamState.maybeCompact(spark, dir, maxFiles = 2,
            crashAfter = Some(crashPoint))
        }
        // next batch's first touch runs recovery — the full state must
        // be back, complete, at the canonical path
        StreamState.recover(spark, dir)
        assert(stateRows(dir) == expected,
          s"state lost after crash at $crashPoint")
        // and the interrupted run left no sibling residue
        assert(!new java.io.File(dir + "_compacting").exists(),
          s"stale _compacting after recovery from $crashPoint")
        assert(!new java.io.File(dir + "_old").exists(),
          s"stale _old after recovery from $crashPoint")
        // a subsequent compaction completes normally (force: after a
        // post-write crash the recovered dir may already be compact)
        assert(StreamState.maybeCompact(spark, dir, maxFiles = 2,
          force = true))
        assert(stateRows(dir) == expected)
      } finally rmrf(root)
    }
  }

  test("maybeCompact recovery is exercised by the operator path too: " +
    "recover() before append keeps a fresh append from masquerading " +
    "as the whole state") {
    val root = tmpDir("graft_kill2_")
    val dir = s"$root/state"
    try {
      seedState(dir, rows = 30, files = 6)
      val expected = stateRows(dir)
      // kill mid-swap at the worst point: canonical dir missing
      intercept[SimulatedCrash] {
        StreamState.maybeCompact(spark, dir, maxFiles = 2,
          crashAfter = Some("renameOld"))
      }
      assert(!new java.io.File(dir).exists(), "precondition: dir mid-swap")
      // the operator contract: recover BEFORE appending the next batch
      StreamState.recover(spark, dir)
      import spark.implicits._
      Seq((1000L, "new")).toDF("doc_id", "h")
        .write.mode("append").parquet(dir)
      assert(stateRows(dir) == expected + 1000L)
    } finally rmrf(root)
  }

  test("compaction width is size-based: per-file bytes stay near the " +
    "target instead of a fixed 4-way coalesce") {
    val root = tmpDir("graft_width_")
    val dir = s"$root/state"
    try {
      seedState(dir, rows = 2000, files = 10)
      StreamState.clearTelemetry()
      // ~2000 rows of (long, short string): force a small per-file
      // budget so the sizing math must emit MANY bounded files
      assert(StreamState.maybeCompact(spark, dir, maxFiles = 2,
        targetBytesPerFile = 4096L))
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length > 4,
        s"expected size-based width > 4 files, got ${files.length}")
      // hard cap: no output file dramatically over target (parquet
      // footer overhead makes tiny files compress unpredictably — allow
      // a generous factor, the point is the BOUND scales with target)
      assert(files.forall(_.length < 4096L * 8),
        s"file over size bound: ${files.map(_.length).max}")
      assert(stateRows(dir).size == 2000)
      // telemetry row recorded for the compaction
      val ev = StreamState.telemetry.last
      assert(ev.files_before == 10 && ev.files_after == files.length &&
        ev.rows_before == 2000 && ev.rows_after == 2000)
    } finally rmrf(root)
  }

  test("compaction telemetry: dedup is visible (rows_after < " +
    "rows_before when replays appended duplicates)") {
    val root = tmpDir("graft_tele_")
    val dir = s"$root/state"
    try {
      seedState(dir, rows = 50, files = 5)
      seedState(dir, rows = 50, files = 5) // replayed appends
      StreamState.clearTelemetry()
      assert(StreamState.maybeCompact(spark, dir, maxFiles = 2))
      val ev = StreamState.telemetry.last
      assert(ev.rows_before == 100 && ev.rows_after == 50,
        s"telemetry $ev")
      assert(ev.files_before == 10 && ev.files_after < 10)
      assert(StreamState.telemetryDf(spark).count() >= 1)
    } finally rmrf(root)
  }

  /** One doc row per file, monotone mtimes so the file source drains
    * id-ordered (the reference's keyset-pagination arrival).
    */
  private def writeDocFiles(root: String,
      docs: Seq[(Long, String)], mtimeBase: Long): Unit = {
    import spark.implicits._
    docs.zipWithIndex.foreach { case ((id, text), i) =>
      val tmp = s"$root/_w"
      Seq((id, text, "en", "crafted", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$root/stream/d${id}.parquet")
      dest.getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath, dest.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dest.setLastModified(mtimeBase + i * 2000L)
      rmrf(tmp)
    }
  }

  test("durable stateRoot + checkpoint: a restarted streamingExactDedup " +
    "resumes its registry and suppresses a cross-restart duplicate") {
    val root = tmpDir("graft_durable_")
    val stateRoot = s"$root/shared_store"
    try {
      val t0 = System.currentTimeMillis() - 600000L
      writeDocFiles(root, Seq(
        (1L, "alpha bravo charlie"),
        (2L, "delta echo foxtrot")), t0)
      val first = StreamingOps.streamingExactDedup(spark, root,
          sourceDir = Some(s"$root/stream"), sourceGlob = "*.parquet",
          maxFilesPerTrigger = Some(1),
          stateRoot = Some(stateRoot))
        .collect().map(_.getLong(0)).toSet
      Caches.releaseAll(spark)
      assert(first == Set(1L, 2L))
      // state + checkpoint survive on the "shared store"
      assert(new java.io.File(s"$stateRoot/registry").exists())
      assert(new java.io.File(s"$stateRoot/_checkpoint").exists())
      // RESTART: new files arrive — doc 3 duplicates doc 1's content.
      // The resumed run must skip already-processed files (checkpoint)
      // and dedup against the persisted registry (durable state).
      writeDocFiles(root, Seq(
        (3L, "alpha bravo charlie"),
        (4L, "golf hotel india")), t0 + 60000L)
      val second = StreamingOps.streamingExactDedup(spark, root,
          sourceDir = Some(s"$root/stream"), sourceGlob = "*.parquet",
          maxFilesPerTrigger = Some(1),
          stateRoot = Some(stateRoot))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      Caches.releaseAll(spark)
      // keepers: 1, 2, 4 (3 suppressed — its hash is doc 1's); the
      // registry counts doc 1's content twice across the two runs
      assert(second.keySet == Set(1L, 2L, 4L), s"got $second")
      assert(second(1L) == 2L,
        s"cross-restart copy count wrong: $second")
    } finally { Caches.releaseAll(spark); rmrf(root) }
  }

  test("out-of-order arrival trips the contract guard instead of " +
    "silently mis-keeping (q235 exact dedup)") {
    val root = tmpDir("graft_ooo_")
    try {
      val t0 = System.currentTimeMillis() - 600000L
      import spark.implicits._
      // file with HIGH ids arrives first (earlier mtime), low ids after
      def writeOne(id: Long, mtime: Long): Unit = {
        val tmp = s"$root/_w"
        Seq((id, s"text $id", "en", "crafted", 7L))
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dest = new java.io.File(s"$root/stream/f${id}.parquet")
        dest.getParentFile.mkdirs()
        java.nio.file.Files.move(part.toPath, dest.toPath)
        dest.setLastModified(mtime)
        rmrf(tmp)
      }
      writeOne(50L, t0)
      writeOne(7L, t0 + 5000L) // arrives second, id below the seen max
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        StreamingOps.streamingExactDedup(spark, root,
          sourceDir = Some(s"$root/stream"), sourceGlob = "*.parquet",
          maxFilesPerTrigger = Some(1)).collect()
      }
      def causes(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
      assert(causes(ex).exists(c =>
        c.isInstanceOf[IllegalStateException] &&
          c.getMessage.contains("out-of-order arrival")),
        s"wrong failure: $ex")
    } finally { Caches.releaseAll(spark); rmrf(root) }
  }
}
