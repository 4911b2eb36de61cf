package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Commit-time contract enforcement with a dead-letter quarantine
  * (q496–q497, block 72): the Delta-constraints / DLT-expectations
  * shape the read-side contract family (q376–q380) stops short of —
  * an audit reports bad data AFTER it landed; a production ledger
  * refuses it AT THE COMMIT. Each fold splits its micro-batch on the
  * declared 'error' rule: passing rows fold into the state version,
  * violating rows commit BESIDE it to a dead-letter ledger under the
  * SAME micro-batch id — one incident, two tables, reconcilable by
  * stream position. Nothing drops silently: the conservation law
  * (committed + quarantined = arrived, per position) is exactly what
  * q496 oracles, and one row routed wrong breaks the hash.
  *
  * Declared rule on the registry probe: `n_chars >= 100`, severity
  * 'error' (the q377 domain-rule catalog's short-doc finding,
  * promoted from warn-report to commit gate; the fixture carries
  * violation mass at every sf, so the quarantine is non-vacuous).
  *
  * Reference anchor: the reference validates row shape before its
  * INSERT chunks (`saveToPostgres.js` key normalization + filters) —
  * accept-or-drop at write time, with the drop unrecorded. The
  * dead-letter ledger is that decision made auditable.
  *
  * 100 TB shape: the split is one predicate over the batch the fold
  * already scans (two writes instead of one, each O(its rows)); the
  * quarantine is violation-sized, not corpus-sized; the manifest is
  * ≤ #versions narrow reads.
  */
object GatedCommit {

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The declared 'error' rule: rows below the floor quarantine.
    * NULL-safe on purpose: `n_chars >= 100` is UNKNOWN for a NULL
    * n_chars, and a plain `filter(p)` / `filter(!p)` split drops
    * UNKNOWN rows from BOTH sides — the silent loss the conservation
    * law exists to forbid. A row the gate cannot evaluate routes to
    * quarantine (fail-closed), so committed + quarantined = arrived
    * holds for every input, not just the fixture's.
    */
  private val MinChars = 100L
  private def passes = coalesce(col("n_chars") >= MinChars, lit(false))

  /** The gated 3-batch drain: returns (state root, dead-letter root).
    */
  private[streaming] def gatedLedger(spark: SparkSession,
      dir: String): (String, String) = {
    val streamDir = StreamingOps.idRangeSplitSource(spark,
      Tables.documents(spark, dir).select(col("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars")), 3)
    val root = graft.Caches.trackTempDir(
      Files.createTempDirectory("graft_gated_state_")).toString
    val ledgerRoot = s"$root/state"
    val deadRoot = s"$root/dead"
    val ledger =
      new StreamingOps.VersionedLedger(spark, ledgerRoot, Some(root))
    val dead =
      new StreamingOps.VersionedLedger(spark, deadRoot, Some(root))
    val stream = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir)
    val w = stream.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val ss = batch.sparkSession
        if (!ledger.isReplayed(id)) {
          val rows = batch.select(col("doc_id"), col("source"),
            col("n_chars"))
          val ok = rows.filter(passes)
          val bad = rows.filter(!passes)
            .withColumn("rule", lit(s"n_chars>=$MinChars"))
          val merged =
            if (ledger.isEmpty) ok
            else ss.read.parquet(ledger.path).unionByName(ok)
          val deadMerged =
            if (dead.isEmpty) bad
            else ss.read.parquet(dead.path).unionByName(bad)
          // QUARANTINE-FIRST (the tombstone-first discipline): the
          // replay gate keys off the STATE ledger, so the dead-letter
          // version must exist before the state version commits — a
          // crash between the two writes then re-runs the whole fold
          // (state not committed), with the dead side's own replay
          // guard keeping its trail single-versioned. The reverse
          // order would mark the batch replayed with its quarantine
          // lost forever.
          if (!dead.isReplayed(id)) dead.write(deadMerged, id)
          ledger.write(merged, id)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
    StreamingOps.startWithCheckpoint(w, Some(root)).awaitTermination()
    (ledgerRoot, deadRoot)
  }

  /** q496: the gated-commit manifest — per stream position, the state
    * and quarantine masses and the conservation verdict
    * (committed + quarantined = every row that arrived by then).
    */
  def gatedCommitManifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (stateRoot, deadRoot) = gatedLedger(spark, dir)
    val states = Provenance.committedVersions(spark, stateRoot)
      .map { case (v, b, path) =>
        (v, b, spark.read.parquet(path).count())
      }
    val deads = Provenance.committedVersions(spark, deadRoot)
      .map { case (v, b, path) => ((v, b), spark.read.parquet(path)
        .count()) }.toMap
    states.map { case (v, b, nOk) =>
      val nBad = deads.getOrElse((v, b), 0L)
      (v, b, nOk, nBad, nOk + nBad)
    }.toDF("version", "batch_id", "n_committed", "n_quarantined",
        "n_arrived")
      .orderBy(col("version"))
  }

  /** q497: the dead-letter census — per source, the quarantined rows
    * and their character mass, with the violated rule. The table a
    * producer gets back when asking "what did you refuse and why".
    */
  def deadLetterCensus(spark: SparkSession, dir: String): DataFrame = {
    val (_, deadRoot) = gatedLedger(spark, dir)
    val (_, _, head) = Provenance.committedVersions(spark, deadRoot)
      .last
    spark.read.parquet(head)
      .groupBy(col("source"), col("rule"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy(col("source"))
  }
}
