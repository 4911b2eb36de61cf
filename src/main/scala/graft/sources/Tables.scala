package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver testdata tables (TESTDATA.md).
  *
  * Maps the reference's sources (SURVEY.md §2.1) onto parquet scans:
  * the HTTP paginated fetch (`src/services/fetchContact.js:5-11`) and the
  * keyset-paginated PostgreSQL scan (`src/services/preloadRedis.js:41-52`)
  * both become a single declarative `spark.read.parquet` — Spark's split
  * planning parallelizes what the reference serializes page-by-page.
  *
  * At 100 TB these would be partitioned/bucketed table scans; Catalyst
  * pushes filters and prunes columns into the scan automatically, so the
  * query functions never pre-materialize.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` normalized to `timestamp_ntz` (µs) regardless of how the
    * fixture generation wrote it. Generations have shipped it as parquet
    * TIMESTAMP(NANOS) (no native Spark type — surfaces as nanos-since-
    * epoch long under `nanosAsLong`) and as TIMESTAMP(MICROS) (surfaces
    * as `timestamp_ntz` directly). Dispatch on the footer schema so both
    * read identically. NTZ matches the oracle's naive timestamp semantics
    * exactly, independent of session timezone; the nanos branch uses
    * integer `div` so the truncation is exact (a double roundtrip would
    * lose precision at 2024-epoch nanos ≈ 1.7e18).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, dir, "events")
    normalizeTs(raw)
  }

  /** Normalize a `ts` column to `timestamp_ntz` from any fixture vintage:
    * nanos-as-long → exact integer truncation to µs; timestamp (µs, tz'd
    * or not) → plain cast (identity wall-clock under the UTC session).
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
      case org.apache.spark.sql.types.TimestampNTZType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** Spread a scan's rows across the session's cores when the input
    * cannot supply that parallelism itself. Parquet parallelism is
    * bounded by row groups, not `maxPartitionBytes`: a single-file
    * single-row-group fixture decodes in ONE task, and everything
    * downstream of it — including reads of a cache built on top —
    * inherits that one non-empty partition. For compute-heavy
    * full-corpus pipelines the one-time ~file-size shuffle buys a
    * cores-wide stage for every later pass. Scale-aware no-op: a real
    * multi-file corpus (file count ≥ cores) already scans parallel, so
    * the extra exchange is skipped — parallelism = max(splits, cores).
    */
  def parallelized(spark: SparkSession, df: DataFrame): DataFrame = {
    val p = spark.sparkContext.defaultParallelism
    if (df.inputFiles.length < p) df.repartition(p) else df
  }
}
