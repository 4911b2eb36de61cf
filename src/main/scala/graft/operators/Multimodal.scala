package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, processed in partition-local batches. The container
  * has no image/audio codecs, so the decode step is a clearly-marked
  * deterministic fake ([[fakeDecodeBytes]]) — the Spark-side contract
  * (schema, batch shape, partition locality, binary handling) is real
  * and is what matters at 100 TB: bytes never leave the executor, only
  * extracted features shuffle.
  */
object Multimodal {

  /** Opaque-binary metadata extraction — pure column ops on a binary
    * payload (here: the document text bytes standing in for a media
    * blob): type tag, byte length, content hash, leading-bytes sample.
    * Every output is engine-exact (oracle-checked).
    */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("content_hash"),
        lower(hex(substring(col("text"), 1, 8).cast("binary"))).as("head_bytes"))
      .orderBy(col("doc_id"))

  /** STUB decoder — stands in for an image/audio codec, which this
    * container does not ship. Deterministic: "frames" are fixed-stride
    * byte windows, the "feature" is the window's mean byte value. The
    * real codec would be dropped in here without touching the pipeline
    * shape around it.
    */
  def fakeDecodeBytes(payload: Array[Byte], frameSize: Int): Seq[(Int, Double)] =
    payload.grouped(frameSize).zipWithIndex.map { case (frame, idx) =>
      (idx, frame.map(b => (b & 0xff).toDouble).sum / frame.length)
    }.toSeq

  final case class Frame(doc_id: Long, frame_idx: Int, mean_intensity: Double)

  /** Partition-local batch decode: the Scala analogue of a Pandas-batch
    * UDF — rows stream through `mapPartitions` so decode state (a real
    * codec context) would be initialized once per partition, not per
    * row, and the binary payload never shuffles.
    */
  def frameFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    docs.mapPartitions { rows =>
      // per-partition init would go here (codec context, model handle)
      rows.flatMap { case (id, payload) =>
        fakeDecodeBytes(payload, 32).map { case (idx, mean) =>
          Frame(id, idx, mean)
        }
      }
    }.toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  final case class FrameAgg(doc_id: Long, n_frames: Long, frame_sums: String)

  /** Aggregate-per-doc frame features (q146) — the PRODUCTION shape of
    * [[frameFeatures]] at 100 TB: q39 emits one row per 32-byte frame,
    * so its presentation sort is a global order over bytes/32 rows;
    * here the whole frame sequence stays ROW-LOCAL (one output row per
    * document, the q127 serialization pattern), so the only exchange
    * in the plan is the final per-doc sort — guarded by a ScaleSpec
    * plan test. Features are the exact integer byte-sums per frame
    * (no division), comma-serialized, so the oracle is bit-exact
    * including the ragged tail frame q122 has to truncate. q39 stays
    * as the per-frame oracle twin.
    */
  def frameFeaturesAgg(spark: SparkSession, dir: String,
      frameSize: Int = 32): DataFrame =
    frameFeaturesAggDf(Tables.documents(spark, dir), frameSize)

  /** Core over an explicit documents frame — the per-batch unit the
    * streaming twin (q233) reuses inside foreachBatch.
    */
  private[graft] def frameFeaturesAggDf(docsRaw: DataFrame,
      frameSize: Int = 32): DataFrame = {
    val spark = docsRaw.sparkSession
    import spark.implicits._
    val docs = docsRaw
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    docs.mapPartitions { rows =>
      // per-partition init would go here (codec context, model handle)
      rows.map { case (id, payload) =>
        val sums = payload.grouped(frameSize)
          .map(_.map(b => (b & 0xff).toLong).sum).toSeq
        FrameAgg(id, sums.length.toLong, sums.mkString(","))
      }
    }.toDF()
      .orderBy(col("doc_id"))
  }

  /** Media near-duplicate detection (q163): the dedup machinery applied
    * to the MEDIA family — each document's payload reduces to its SET
    * of distinct frame byte-sums (q146's exact integer features, as
    * strings), which then flow through the very same md5 min-hash
    * banding + exact-Jaccard verification as text dedup (q95): two
    * media blobs sharing most frames collide in a band and verify on
    * frame-set overlap. Re-encoded/re-containered copies whose byte
    * hashes differ (so q28-style exact dedup misses them) but whose
    * decoded frames agree are exactly what this catches. Fully oracled:
    * DuckDB rebuilds the frame sums, signatures, bands and
    * verification end-to-end.
    *
    * 100 TB shape: frames never leave the executor (row-local
    * reduction to a bounded signature); candidates are banding-bounded;
    * only frame-sum strings and hashes shuffle, never payload bytes.
    */
  def mediaNearDup(spark: SparkSession, dir: String,
      frameSize: Int = 32, minJaccard: Double = 0.5): DataFrame = {
    import graft.operators.Dedup
    val sh = frameFeaturesAgg(spark, dir, frameSize)
      .select(col("doc_id"),
        array_distinct(split(col("frame_sums"), ",")).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
    val banded = Dedup.md5BandedSignatures(sh)
    val pairs = Dedup.bandSelfJoinPairs(banded)
    Dedup.md5VerifyPairs(pairs, sh, "id_a", "id_b", minJaccard)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Deterministic 1-in-k frame sampling over a decoded frame sequence
    * — the temporal-subsampling step of every video featurizer (keep
    * frame 0, k, 2k, …). Pure function so the pipeline op and its tests
    * share it.
    */
  def sampleFrames(frames: Seq[(Int, Double)], every: Int): Seq[(Int, Double)] =
    frames.filter { case (idx, _) => idx % every == 0 }

  /** Deterministic "resize": resample a variable-length feature
    * sequence onto a fixed-size grid by bucket means — the 1-D analogue
    * of image resize, with integer bucket edges `i*n/target` so the
    * result is reproducible everywhere. Sequences shorter than the grid
    * occupy the spread bucket indices `i*target/n` — intermediate
    * buckets stay empty (no interpolation — a codec's resampler would
    * slot in here); Wave3Spec pins Seq(7,9)→4 buckets landing on 0 and 2.
    */
  def resizeFeatures(feats: Seq[Double], target: Int): Seq[(Int, Double)] = {
    val n = feats.length
    if (n == 0) Seq.empty
    else feats.zipWithIndex
      .groupBy { case (_, i) => math.min(i.toLong * target / n, target - 1L).toInt }
      .toSeq.sortBy(_._1)
      .map { case (b, xs) => (b, xs.map(_._1).sum / xs.length) }
  }

  final case class Feat(doc_id: Long, bucket: Int, feat: Double)

  /** The full media featurization pipeline (q107): decode → frame-sample
    * → resize, all inside ONE `mapPartitions` pass — the 100 TB contract
    * for media columns: the binary payload is decoded, subsampled, and
    * reduced to a fixed-size feature grid WITHOUT leaving the executor;
    * only |target| small rows per document ever shuffle (here only for
    * the presentation sort). Swapping [[fakeDecodeBytes]] for a real
    * codec changes no pipeline shape.
    */
  def mediaPipeline(spark: SparkSession, dir: String, frameSize: Int = 32,
      sampleEvery: Int = 4, targetBuckets: Int = 8): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    docs.mapPartitions { rows =>
      rows.flatMap { case (id, payload) =>
        val sampled = sampleFrames(fakeDecodeBytes(payload, frameSize),
          sampleEvery)
        resizeFeatures(sampled.map(_._2), targetBuckets).map {
          case (b, f) => Feat(id, b, f)
        }
      }
    }.toDF()
      .orderBy(col("doc_id"), col("bucket"))
  }

  /** Oracled twin of [[mediaPipeline]] (q122): the identical decode →
    * frame-sample → resize pipeline, with the payload truncated to
    * whole `frameSize`-byte frames. With 32 a power of two, every
    * frame mean is a dyadic rational (integer sum / 32) — exactly
    * representable as a double, so the resize bucket sums are exact
    * and order-independent, and the single closing IEEE division is
    * deterministic cross-engine. DuckDB reproduces the same arithmetic
    * from `ascii()` byte values, which hash-checks the whole media
    * plumbing (batch decode shape, sampling, grid resize) the way the
    * md5 twins do for the dedup/ANN families. The production path
    * (q107) keeps the ragged tail frame; its tail mean divides by an
    * arbitrary frame length, which is the one non-dyadic step this
    * twin trades away for an exact oracle.
    */
  def mediaPipelineOracled(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frameSize = 32
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    docs.mapPartitions { rows =>
      rows.flatMap { case (id, payload) =>
        val whole = payload.take(payload.length - payload.length % frameSize)
        val sampled = sampleFrames(fakeDecodeBytes(whole, frameSize), 4)
        resizeFeatures(sampled.map(_._2), 8).map {
          case (b, f) => Feat(id, b, f)
        }
      }
    }.toDF()
      .orderBy(col("doc_id"), col("bucket"))
  }
}
