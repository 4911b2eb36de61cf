package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Optimistic concurrency control for versioned ledgers (q442–q443,
  * block 45): the missing multi-writer story. Every ledger so far is
  * single-writer by contract (one streaming query owns one root); a
  * real 100 TB deployment has compaction jobs, erasure requests, and
  * backfills all wanting to commit against the SAME state table. This
  * module adds the Delta/Iceberg-shaped commit protocol on top of the
  * existing `b<v>_<batch>` layout:
  *
  *  - a writer stages its rewrite against the snapshot it read (its
  *    BASE version), then claims the next version number by
  *    `rename(staging, b<v+1>_<batch>)` PLUS an ownership verify —
  *    Hadoop rename has mv semantics (renaming onto an existing dir
  *    nests the source inside it, returning true), so the claim is
  *    only real if the staging dir BECAME dest; a writer that finds
  *    its staging nested lost the race, un-nests, and loops (never a
  *    torn commit, never two owners of one version — OccRaceSpec
  *    races 7 threads through this exact window);
  *  - a writer whose base is stale (someone committed after it read)
  *    must CONFLICT-CHECK before rebasing: its write set is
  *    intersected with the keys written by every version in
  *    `(base, current]`. Disjoint → rebase (re-apply the delta on the
  *    current snapshot and try again); overlapping → abort — the
  *    transactional no-lost-update guarantee (first committer wins,
  *    the loser's increment must not silently clobber).
  *
  * Conflict checks are METADATA reads: every OCC commit stages its
  * change set (`_changeset` — keys plus old/new values, computed
  * against the snapshot actually rewritten) inside the version dir
  * before the rename, so `_changeset` commits atomically with the
  * state and [[changesSince]] unions those files instead of diffing
  * row data. The adjacent-version DIFF ([[writtenKeys]]) survives in
  * two roles only: the fallback for versions committed outside the
  * protocol (the v0 bootstrap, legacy dirs — which by construction
  * declared no change set), and the q457 parity audit that certifies
  * stored change sets faithful. OccSpec additionally plants a forged
  * `_changeset` over a content-identical version and pins that the
  * conflict verdict follows the metadata — the proof the executor
  * consumes `_changeset`, not row diffs.
  *
  * Deterministic schedule (all three writers read base v0): writer A
  * (keys ≡ 0 mod 3, +7) commits first → v1; writer C (keys ≡ 0 mod
  * 6, +1000 — a subset of A's write set) finds every one of its keys
  * in v1's diff → ABORTS; writer B (keys ≡ 1 mod 3, +11) is disjoint
  * from v1's diff → rebases onto v1 and commits v2. The final state
  * is the serial A-then-B application and carries no trace of C —
  * exactly what the oracle recomputes analytically.
  *
  * Reference anchor: the reference serializes all writes through one
  * Node process and a single pg pool (`saveToPostgres.js` chunks,
  * `server.js` one route at a time) — concurrency control by
  * accident of architecture. At cluster scale the accident is gone
  * and the protocol has to be explicit.
  *
  * 100 TB shape: staging writes are the rewrite the writer was doing
  * anyway; the claim is one filesystem rename; the conflict check
  * reads stored change-set metadata (key-grain, ≤ #versions files),
  * never row data of the corpus.
  */
object Occ {

  /** Outcome of one writer's commit attempt. */
  private[graft] final case class Attempt(
      writer: String, baseVersion: Long, nDeltaKeys: Long,
      nConflictKeys: Long, outcome: String, commitVersion: Long)

  /** Keys written by version `v` relative to its parent, recovered by
    * DIFF (new keys or keys whose value changed) — the fallback for
    * versions that declared no change set, and the q457 parity side.
    */
  private def writtenKeys(spark: SparkSession, parentPath: String,
      childPath: String): DataFrame = {
    val parent = spark.read.parquet(parentPath)
      .select(col("c_custkey"), col("n_orders").as("p_val"))
    spark.read.parquet(childPath)
      .join(parent, Seq("c_custkey"), "left")
      .filter(col("p_val").isNull || col("p_val") =!= col("n_orders"))
      .select(col("c_custkey"))
  }

  private def hasChangeset(spark: SparkSession, path: String): Boolean =
    Provenance.hasCommittedChangeset(spark, path)

  /** Union of change sets of every version in `(base, current]` —
    * served from the stored `_changeset` metadata (never row data);
    * only a version committed without one (bootstrap/legacy) falls
    * back to the adjacent-version diff.
    */
  private def changesSince(spark: SparkSession,
      versions: Seq[(Long, Long, String)], base: Long): DataFrame = {
    val after = versions.filter(_._1 > base)
    val keySets = after.map { case (v, _, path) =>
      if (hasChangeset(spark, path))
        spark.read.parquet(s"$path/_changeset").select(col("c_custkey"))
      else {
        val parent = versions.filter(_._1 < v).maxBy(_._1)
        writtenKeys(spark, parent._3, path)
      }
    }
    keySets.reduce(_.unionByName(_)).distinct()
  }

  /** One writer's full OCC attempt: stage against the read snapshot,
    * conflict-check if stale, rebase-and-claim or abort. `delta`
    * receives the snapshot it must rewrite (update-in-place of the
    * writer's key set) and returns the FULL next state. The claim
    * itself is the atomic rename; a lost race (dest exists) re-enters
    * the check loop rather than failing.
    */
  private[graft] def tryCommit(spark: SparkSession,
      ledgerRoot: String, writer: String, readBase: Long,
      deltaKeys: DataFrame => DataFrame,
      delta: DataFrame => DataFrame): Attempt = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(ledgerRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val baseSnap = Provenance.committedVersions(spark, ledgerRoot)
      .find(_._1 == readBase)
      .getOrElse(sys.error(s"occ: base version $readBase not committed"))
    val nDelta = deltaKeys(spark.read.parquet(baseSnap._3)).count()
    var attemptBase = readBase
    // bounded: each iteration either returns, or the current version
    // advanced (a racing commit landed — progress). A rename that
    // fails with NO new version (permissions, fs fault) must not spin.
    var attempts = 0
    while (attempts < 16) {
      attempts += 1
      val versions = Provenance.committedVersions(spark, ledgerRoot)
      val (vcur, bcur, pcur) = versions.maxBy(_._1)
      // the write set this attempt will commit, computed ONCE per
      // attempt against the snapshot actually being rewritten (the
      // rebased parent — a delta whose key set depends on parent
      // state must declare keys vs pcur, not the stale base) and
      // persisted: the conflict probe and the stored change set read
      // this same frame instead of re-deriving it three times
      val parentSnap = spark.read.parquet(pcur)
      val dk = deltaKeys(parentSnap).persist()
      try {
        if (vcur > attemptBase) {
          // stale base: writers committed past us — conflict check
          // against the stored change-set METADATA of every version
          // in (attemptBase, vcur]
          val conflicts = changesSince(spark, versions, attemptBase)
            .join(dk, Seq("c_custkey"), "inner")
            .count()
          if (conflicts > 0L)
            return Attempt(writer, readBase, nDelta, conflicts,
              "aborted", -1L)
          attemptBase = vcur // disjoint: rebase onto the current snapshot
        }
        val next = delta(parentSnap)
        val dest = s"$ledgerRoot/b${vcur + 1}_$bcur"
        // underscore prefix: a staging dir must never match the
        // committed-version name pattern, or a reader racing the
        // stage-to-rename window (or surveying after a writer crash)
        // would list an uncommitted version as committed
        val staging = s"$ledgerRoot/_staging_b${vcur + 1}_${bcur}_$writer"
        next.write.mode("overwrite").parquet(staging)
        // the change set rides INSIDE the staged version (an
        // underscore dir — hidden from state reads) so the rename
        // commits state and metadata in one atomic step; it carries
        // old/new values (old from the rebased parent, new from the
        // staged state) so both later conflict checks AND the change
        // feed are metadata reads (q457 pins it equal to the diff)
        dk.join(parentSnap
            .select(col("c_custkey"), col("n_orders").as("old_val")),
            Seq("c_custkey"), "left")
          .join(spark.read.parquet(staging)
            .select(col("c_custkey"), col("n_orders").as("new_val")),
            Seq("c_custkey"), "left")
          .write.mode("overwrite").parquet(s"$staging/_changeset")
        // commit timestamp, atomically with the claim (q512's axis)
        Provenance.writeCommitTs(spark, staging,
          Provenance.CommitClock.ofBatch(bcur))
        // the atomic claim: rename, then VERIFY ownership. Hadoop
        // FileSystem.rename has mv semantics — renaming onto an
        // EXISTING directory moves the source INSIDE it and still
        // returns true — so a bare exists()+rename pair is a TOCTOU
        // window where two racing writers both "claim" the same
        // version and one increment is silently lost (OccRaceSpec
        // caught exactly this under 7 real threads). The verify is
        // cheap and decisive: if our uniquely-named staging dir now
        // sits NESTED inside dest, the rename lost to an earlier
        // committer — undo the nest (it is underscore-prefixed, so
        // readers never saw it) and loop back into the conflict
        // check against the new current version. Only the writer
        // whose staging BECAME dest returns success.
        if (!fs.exists(new Path(dest)) &&
            fs.rename(new Path(staging), new Path(dest))) {
          val nested = new Path(dest, new Path(staging).getName)
          if (!fs.exists(nested))
            return Attempt(writer, readBase, nDelta, 0L,
              if (attemptBase == readBase) "committed" else "rebased",
              vcur + 1)
          fs.delete(nested, true)
        } else fs.delete(new Path(staging), true)
      } finally dk.unpersist(false)
    }
    sys.error(s"occ: writer $writer could not claim a version in 16 " +
      s"attempts under $ledgerRoot — filesystem fault, not a race")
  }

  /** Build the base ledger (v0 = per-custkey order counts) and run the
    * fixed A → C → B schedule. Returns (attempts, ledgerRoot). Fresh
    * roots every call — the form OccSpec mutates (squatted versions,
    * forged change sets); the query surface reads [[scheduleShared]].
    */
  private[graft] def runSchedule(spark: SparkSession,
      dir: String): (Seq[Attempt], String) = {
    val root = graft.Caches.trackTempDir(
      Files.createTempDirectory("graft_occ_")).toString
    runScheduleAt(spark, dir, s"$root/balances")
  }

  /** The schedule as a build-once shared artifact: the committed
    * ledger plus the attempt log stored beside it (`_attempts` — an
    * underscore dir, invisible to version listings), so the five
    * OCC-consuming queries (q442/q443/q453/q457/q494) share ONE
    * protocol run per corpus. Read-only by contract; tests that
    * mutate trails use [[runSchedule]]'s fresh roots.
    */
  private[graft] def scheduleShared(spark: SparkSession,
      dir: String): (DataFrame, String) = {
    val fp = LedgerArtifacts.fingerprint(
      Tables.read(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey")),
      Seq("o_orderkey", "o_custkey"))
    val ledgerRoot = LedgerArtifacts.shared(spark,
      s"occ_schedule_${LedgerArtifacts.dirKey(dir)}", fp) { root =>
      import spark.implicits._
      val (attempts, lr) = runScheduleAt(spark, dir, s"$root/state")
      attempts.toDF("writer", "base_version", "n_delta_keys",
          "n_conflict_keys", "outcome", "commit_version")
        .coalesce(1).write.mode("overwrite").parquet(s"$lr/_attempts")
    }
    (spark.read.parquet(s"$ledgerRoot/_attempts"), ledgerRoot)
  }

  /** The balance bump every schedule writer applies: +inc on its key
    * class, identity elsewhere (an update-in-place delta).
    */
  private def bump(keyPred: org.apache.spark.sql.Column, inc: Long)
      (snap: DataFrame): DataFrame =
    snap.withColumn("n_orders",
      when(keyPred, col("n_orders") + inc).otherwise(col("n_orders")))

  /** Seed version 0: per-custkey order counts. */
  private def writeV0(spark: SparkSession, dir: String,
      ledgerRoot: String): Unit =
    Tables.read(spark, dir, "orders")
      .groupBy(col("o_custkey").cast("long").as("c_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .write.mode("overwrite").parquet(s"$ledgerRoot/b0_0")

  private def runScheduleAt(spark: SparkSession, dir: String,
      ledgerRoot: String): (Seq[Attempt], String) = {
    writeV0(spark, dir, ledgerRoot)
    val a = tryCommit(spark, ledgerRoot, "a", 0L,
      snap => snap.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey")),
      bump(col("c_custkey") % 3 === 0, 7L))
    val c = tryCommit(spark, ledgerRoot, "c", 0L,
      snap => snap.filter(col("c_custkey") % 6 === 0)
        .select(col("c_custkey")),
      bump(col("c_custkey") % 6 === 0, 1000L))
    val b = tryCommit(spark, ledgerRoot, "b", 0L,
      snap => snap.filter(col("c_custkey") % 3 === 1)
        .select(col("c_custkey")),
      bump(col("c_custkey") % 3 === 1, 11L))
    (Seq(a, c, b), ledgerRoot)
  }

  /** q457: stored-change-set vs diff-recovered change-set parity —
    * per committed writer version, the key count each path reports
    * and their set equality. The conflict check ([[changesSince]])
    * consumes the stored metadata, so this audit is what keeps it
    * honest: one row with `equal = false` means the stored change set
    * under-declares (a missed conflict waiting to happen) or
    * over-declares (false aborts), and the oracle hash breaks.
    */
  def occChangesetParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (_, ledgerRoot) = scheduleShared(spark, dir)
    val versions = Provenance.committedVersions(spark, ledgerRoot)
    versions.filter(_._1 > 0L).map { case (v, _, path) =>
      val stored = spark.read.parquet(s"$path/_changeset")
      val parent = versions.filter(_._1 < v).maxBy(_._1)
      val diffed = writtenKeys(spark, parent._3, path)
      val nStored = stored.count()
      val nDiffed = diffed.count()
      val equal = nStored == nDiffed &&
        stored.join(diffed, Seq("c_custkey"), "left_anti").count() == 0L
      (v, nStored, nDiffed, equal)
    }.toDF("version", "n_stored", "n_diffed", "equal")
      .orderBy(col("version"))
  }

  /** q442: the OCC audit — one row per writer attempt with its base,
    * write-set size, conflict count, and verdict. The protocol's
    * entire decision surface as a table the oracle recomputes
    * analytically from the fixed schedule.
    */
  def occAudit(spark: SparkSession, dir: String): DataFrame = {
    val (attempts, _) = scheduleShared(spark, dir)
    attempts.orderBy(col("writer"))
  }

  /** q443: the final committed state after the schedule — serial
    * A-then-B application, no trace of aborted C. One surviving
    * lost update would break the oracle hash.
    */
  def occFinalState(spark: SparkSession, dir: String): DataFrame = {
    val (_, ledgerRoot) = scheduleShared(spark, dir)
    val (_, _, path) = Provenance.committedVersions(spark, ledgerRoot)
      .maxBy(_._1)
    spark.read.parquet(path)
      .select(col("c_custkey"), col("n_orders"))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------
  // genuine multi-writer concurrency (q510–q511, block 82 — the r16
  // verdict's #2: every prior schedule was a serial replay; the
  // production reason OCC exists is writers racing stage → check →
  // rename from concurrent threads)
  // ---------------------------------------------------------------

  /** The race roster: six writers on pairwise-DISJOINT key classes
    * (`c_custkey % 6 == w`, +10·(w+1)) plus one DUPLICATE of class 0
    * with the same increment. Under any interleaving exactly one of
    * the class-0 pair commits (the other finds its keys in the
    * winner's stored `_changeset` and aborts — the first of the pair
    * to claim a version can never abort, so "both abort" is
    * impossible), and every disjoint writer commits after at most
    * per-version rebases. The END STATE is therefore deterministic —
    * base + 10·(class+1) on every key — even though the
    * version-assignment order is not, which is what makes a genuinely
    * raced protocol oracle-checkable.
    */
  private val RaceWriters: Seq[(String, Int, Long)] =
    (0 to 5).map(w => (s"w$w", w, 10L * (w + 1))) :+ ("dup", 0, 10L)

  /** Run the race: all writers enter [[tryCommit]] concurrently from
    * their own threads, all with read base v0. Returns the attempts
    * in roster order.
    */
  private[graft] def runRace(spark: SparkSession, dir: String,
      ledgerRoot: String): Seq[Attempt] = {
    import java.util.concurrent.{Callable, Executors, TimeUnit}
    writeV0(spark, dir, ledgerRoot)
    val pool = Executors.newFixedThreadPool(RaceWriters.size)
    try {
      val futures = RaceWriters.map { case (name, cls, inc) =>
        pool.submit(new Callable[Attempt] {
          override def call(): Attempt =
            tryCommit(spark, ledgerRoot, name, 0L,
              snap => snap.filter(col("c_custkey") % 6 === cls)
                .select(col("c_custkey")),
              bump(col("c_custkey") % 6 === cls, inc))
        })
      }
      futures.map(_.get(600, TimeUnit.SECONDS))
    } finally pool.shutdownNow()
  }

  /** The race as a build-once shared artifact (deterministic END
    * state; the nondeterministic version-assignment order lives only
    * in `_attempts`, which the queries read as aggregates).
    */
  private[graft] def raceShared(spark: SparkSession,
      dir: String): String = {
    val fp = LedgerArtifacts.fingerprint(
      Tables.read(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey")),
      Seq("o_orderkey", "o_custkey"))
    LedgerArtifacts.shared(spark,
      s"occ_race_${LedgerArtifacts.dirKey(dir)}", fp) { root =>
      import spark.implicits._
      val lr = s"$root/state"
      val attempts = runRace(spark, dir, lr)
      attempts.toDF("writer", "base_version", "n_delta_keys",
          "n_conflict_keys", "outcome", "commit_version")
        .coalesce(1).write.mode("overwrite").parquet(s"$lr/_attempts")
    }
  }

  /** q510: the post-race census — writers in, commits out, aborts,
    * versions on disk, and the conservation verdict (final mass =
    * base mass + every committed increment, the duplicate applied
    * exactly once). The oracle recomputes every number analytically
    * from `orders`; a lost update, a double-applied duplicate, or a
    * torn version would each break a different column.
    */
  def occRaceCensus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = raceShared(spark, dir)
    val attempts = spark.read.parquet(s"$root/_attempts")
    val nCommitted = attempts.filter(col("outcome") =!= "aborted")
      .count()
    val nAborted = attempts.filter(col("outcome") === "aborted").count()
    val versions = Provenance.committedVersions(spark, root)
    val base = spark.read.parquet(versions.head._3)
      .agg(count(lit(1)), sum(col("n_orders"))).collect()(0)
    val fin = spark.read.parquet(versions.maxBy(_._1)._3)
      .agg(count(lit(1)), sum(col("n_orders"))).collect()(0)
    // the analytic expectation: every class bumped once
    val expected = spark.read.parquet(versions.head._3)
      .agg(sum(col("n_orders") +
        (col("c_custkey") % 6 + 1L) * 10L)).collect()(0).getLong(0)
    Seq((RaceWriters.size.toLong, nCommitted, nAborted,
        versions.size.toLong, base.getLong(0), fin.getLong(0),
        base.getLong(1), fin.getLong(1), fin.getLong(1) == expected))
      .toDF("n_writers", "n_committed", "n_aborted", "n_versions",
        "n_keys_base", "n_keys_final", "sum_base", "sum_final",
        "conserved")
  }

  /** q511: the raced final state, full key grain — deterministic
    * (base + 10·(class+1) per key) under every interleaving; one key
    * bumped twice by the duplicate or zero times by a lost update
    * breaks the hash.
    */
  def occRaceState(spark: SparkSession, dir: String): DataFrame = {
    val root = raceShared(spark, dir)
    val (_, _, path) = Provenance.committedVersions(spark, root)
      .maxBy(_._1)
    spark.read.parquet(path)
      .select(col("c_custkey"), col("n_orders"))
      .orderBy(col("c_custkey"))
  }
}
