package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Similarity
import graft.sources.Tables

/** ANN index maintenance with DELETES (q391–q392) — the r13 verdict's
  * #3: q149 maintains the IVF inverted lists under inserts; a
  * production index also needs tombstones and compaction so an erased
  * vector provably cannot be returned by a later search. This module
  * runs the full lifecycle: vectors stream in over the deterministic
  * 3-batch id-range split and are routed to the FIXED q120 md5-nibble
  * coarse quantizer (one broadcast dot-product argmax per batch, the
  * oracled assignment arithmetic), the list membership is kept as a
  * versioned ledger, and a delete request (vec_id % 37 == 0 — the
  * erasure family's modulus on the vector surface) executes through
  * the same tombstone-first [[Erasure.erase]] protocol: tombstones
  * committed beside the ledger, then the lists rewritten as a NEW
  * version with the deleted vectors COMPACTED OUT (not filtered at
  * read — gone from the stored version; AnnDeleteSpec reads the
  * version parquet directly to pin that).
  *
  * 100 TB shape: the quantizer is a bounded broadcast model; per-batch
  * work is row-local assignment plus a ledger append; the delete
  * rewrite touches ONE state-grain table (≤ #vectors rows, never the
  * raw embedding corpus); the post-delete search probes nprobe lists
  * and scores only their members — candidate mass ~ k·|list|, not
  * corpus². Deleted vectors can't be returned because they are not in
  * the lists at all, the same guarantee a compacted FAISS/ScaNN
  * deployment gives, not a post-filter.
  */
object AnnMaintenance {

  private val DeleteMod = 37
  private val NList = 4
  private val Dim = 64

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** The fixed md5-nibble coarse quantizer (the q120/q149 model). */
  private def centroids(spark: SparkSession): DataFrame = {
    val model = (0 until NList).map(c =>
      (c.toLong, (0 until Dim).map(d =>
        Similarity.mdNibbleVal(s"iv|$c|$d")).toSeq))
    spark.createDataFrame(model).toDF("c", "w")
  }

  /** Assign a (vec_id, v) frame to its inverted list: broadcast
    * dot-product argmax, ties to the smaller centroid id — the q120
    * `a`-CTE arithmetic exactly.
    */
  private def assign(vecs: DataFrame, cent: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.VectorExpressions.dotNative
    vecs.crossJoin(broadcast(cent))
      .withColumn("s", dotNative(col("v"), col("w")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("s").desc, col("c"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c").as("cid"), col("s").as("score"))
  }

  /** Stream the embedding corpus in as 3 id-range micro-batches, fold
    * each into the list-membership ledger (tombstone-filtered, replay-
    * gated), then execute the delete request. Returns the post-delete
    * list state and the ledger root.
    */
  private[streaming] def deletedIvfLedger(spark: SparkSession,
      dir: String, mod: Int = DeleteMod): (DataFrame, String) = {
    val cent = centroids(spark)
    val streamDir = StreamingOps.idRangeSplitSource(spark,
      Tables.embeddings(spark, dir)
        .select(col("vec_id").as("doc_id"), col("embedding"),
          col("label")), 3)
    val root = graft.Caches.trackTempDir(
      Files.createTempDirectory("graft_ivf_del_state_")).toString
    val ledgerRoot = s"$root/state"
    val ledger =
      new StreamingOps.VersionedLedger(spark, ledgerRoot, Some(root))
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))))
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir)
    val w = stream.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val ss = batch.sparkSession
        if (!ledger.isReplayed(id)) {
          val rows = Erasure.applyTombstones(ss, ledgerRoot,
            assign(batch.select(col("doc_id").as("vec_id"),
              col("embedding").cast("array<double>").as("v")), cent),
            keyCol = "vec_id")
          val merged =
            if (ledger.isEmpty) rows
            else ss.read.parquet(ledger.path).unionByName(rows)
          ledger.write(merged, id)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
    StreamingOps.startWithCheckpoint(w, Some(root)).awaitTermination()
    Erasure.erase(spark, ledgerRoot,
      Tables.embeddings(spark, dir)
        .filter(col("vec_id") % mod === 0).select(col("vec_id")),
      keyCol = "vec_id")
    val (_, _, path) = Provenance.committedVersions(spark, ledgerRoot)
      .last
    (spark.read.parquet(path), ledgerRoot)
  }

  /** IVF delete maintenance (q391): the per-list census after the
    * delete — surviving vectors per inverted list, plus how many the
    * request removed from each (raw assignment minus survivors; the
    * row an index operator reads to see rebalancing pressure).
    */
  def ivfDeleteMaintenance(spark: SparkSession, dir: String): DataFrame = {
    val (state, _) = deletedIvfLedger(spark, dir)
    val raw = assign(
      Tables.embeddings(spark, dir).select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")),
      centroids(spark))
      .filter(col("vec_id") % DeleteMod === 0)
      .groupBy(col("cid")).agg(count(lit(1)).as("n_deleted"))
    state.groupBy(col("cid")).agg(count(lit(1)).as("n_vectors"))
      .join(raw, Seq("cid"), "full")
      .select(col("cid"),
        coalesce(col("n_vectors"), lit(0L)).as("n_vectors"),
        coalesce(col("n_deleted"), lit(0L)).as("n_deleted"))
      .orderBy(col("cid"))
  }

  /** Delete-then-query (q392): a top-10 nprobe=2 search through the
    * COMPACTED lists for five retained query vectors — the oracled
    * proof that a deleted vector cannot be returned. If the tombstone
    * or the rewrite failed, the deleted neighbors would surface here
    * and the hash would break; the oracle searches the retained corpus
    * by construction, so agreement IS the guarantee.
    */
  def deleteThenQuery(spark: SparkSession, dir: String,
      k: Int = 10, nprobe: Int = 2): DataFrame = {
    import org.apache.spark.sql.graft.VectorExpressions.dotNative
    val (state, _) = deletedIvfLedger(spark, dir)
    val cent = centroids(spark)
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      // barrier: queries, probe routing, and candidate scoring all
      // read the same narrow (vec_id, v) projection
      .persist()
    graft.Caches.onRelease(() =>
      try vecs.unpersist(false) catch { case _: Throwable => () })
    // retained query vectors: ids 1..5 (0 is deleted — 0 % 37 == 0)
    val queries = vecs.filter(col("vec_id") >= 1 && col("vec_id") <= 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    // probe the nprobe closest lists per query (same argmax score)
    val probes = queries.crossJoin(broadcast(cent))
      .withColumn("s", dotNative(col("qv"), col("w")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("s").desc, col("c"))))
      .filter(col("rn") <= nprobe)
      .select(col("q_id"), col("qv"), col("c").as("cid"))
    // candidates = post-delete list members of the probed lists
    val cands = probes
      .join(state.select(col("cid"), col("vec_id")), Seq("cid"))
      .filter(col("vec_id") =!= col("q_id"))
    cands.join(vecs, Seq("vec_id"))
      .withColumn("score", dotNative(col("qv"), col("v")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor"),
        col("score"))
      .orderBy(col("q_id"), col("rank"))
  }
}
