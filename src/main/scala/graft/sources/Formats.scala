package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.Caches

/** Format interop beyond parquet: ORC (the other splittable columnar
  * format a lake-migration meets), CSV (the lowest-common-denominator
  * exchange format), and JSONL (the reference's OWN wire format — its
  * API speaks JSON rows). A Spark-native engine inherits every Hadoop
  * format for free, and this query PROVES the round-trips rather than
  * asserting them: documents are written to all three codecs, read
  * back through each, and aggregated — the oracle checks the same
  * aggregates against the parquet originals, so any encode/decode
  * drift (types, nulls, quoting, escaping) breaks the hash match.
  *
  * Scale notes: the writes shuffle nothing (narrow file rewrite); ORC
  * and JSON round-trip the full row while CSV carries only scalar
  * columns (its contract — no nested types). Temp artifacts register
  * with [[graft.Caches.trackTempDir]], the session-hygiene contract
  * every side-writing query follows.
  */
object Formats {

  private val csvSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def formatRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Caches.trackTempDir(
      Files.createTempDirectory("graft_fmt")).toString
    val docs = Tables.documents(spark, dir)
    docs.write.mode(SaveMode.Overwrite).orc(s"$tmp/docs_orc")
    docs.select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(s"$tmp/docs_csv")
    docs.write.mode(SaveMode.Overwrite).json(s"$tmp/docs_json")

    val fromOrc = spark.read.orc(s"$tmp/docs_orc")
      .groupBy(col("source").as("key"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .select(lit("orc_by_source").as("dim"), col("key"),
        col("n_docs"), col("sum_chars"))
    val fromCsv = spark.read.schema(csvSchema)
      .option("header", "true").csv(s"$tmp/docs_csv")
      .groupBy(col("lang").as("key"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .select(lit("csv_by_lang").as("dim"), col("key"),
        col("n_docs"), col("sum_chars"))
    // JSON re-reads the full row including the text payload, so the
    // checksum-style aggregate (sum of text lengths) catches any
    // escaping/encoding drift, not just row counts
    val fromJson = spark.read.schema(docs.schema).json(s"$tmp/docs_json")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("sum_chars"))
      .select(lit("json_total").as("dim"), lit("all").as("key"),
        col("n_docs"), col("sum_chars"))
    fromOrc.unionAll(fromCsv).unionAll(fromJson)
      .orderBy(col("dim"), col("key"))
  }

  /** Hive-style partitioned write: one directory per partition value,
    * so downstream readers prune whole directories (the read-side proof
    * lives in ScaleSpec's pruning test). At 100 TB the partition column
    * must be low-cardinality and the write repartitioned on it first —
    * otherwise every task writes a file into every partition dir and
    * the lake fills with |tasks|×|partitions| small files.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCol: String): Unit =
    df.repartition(col(partitionCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol).parquet(path)

  /** Small-file compaction — the other half of the small-files problem:
    * rewrite an input with a bounded per-file row count so file sizes
    * land near the scan-efficient target regardless of how fragmented
    * the input arrived. `maxRecordsPerFile` caps each file; the
    * repartition bounds the file COUNT from below at
    * ceil(rows / target), so output file count stays within a small
    * factor of optimal.
    */
  def compact(df: DataFrame, path: String, targetRecordsPerFile: Long): Unit = {
    val rows = df.count()
    val nFiles = math.max(1L, (rows + targetRecordsPerFile - 1) / targetRecordsPerFile)
    df.repartition(nFiles.toInt)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .parquet(path)
  }
}
