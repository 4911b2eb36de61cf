package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bucketed (pre-partitioned) tables — the co-located-join play for a
  * repeated 100 TB join key: pay the shuffle ONCE at write time
  * (`bucketBy` hashes rows into a fixed bucket count per key), then
  * every subsequent join or aggregation on that key plans with ZERO
  * exchange — both scans already agree on partitioning, so a
  * petabyte-scale fact-fact join becomes a per-bucket local sort-merge.
  * `sortBy` inside the bucket additionally drops the sort from the
  * sort-merge join.
  *
  * This is the static sibling of AQE's runtime choices: AQE can pick a
  * broadcast or skew-split at runtime, but only pre-bucketing removes
  * the exchange from a fact-fact join entirely. The reference re-reads
  * its tables per request (`db.js` full-table SELECTs), so its repeated
  * join keys are exactly the case bucketing amortizes.
  *
  * Bucket-count sizing: buckets ≈ table_size / target_partition_size
  * (128–512 MB compressed), and BOTH sides of a co-located join must
  * share the bucket count (or one be a multiple — Spark re-buckets the
  * smaller side's read otherwise). Kept small here for the local
  * warehouse; `BucketedSpec` proves the exchange-free plan.
  */
object Bucketed {

  /** Writes orders + lineitem as bucketed, in-bucket-sorted tables on
    * the order key. Idempotent across sessions: a prior run's managed-
    * table location can outlive the (in-memory) catalog that knew about
    * it, and `Overwrite` refuses to adopt an orphaned location — so
    * drop the table AND clear its directory through the warehouse
    * filesystem first (Hadoop FS API, so the same code works on a
    * cluster store, not just local disk).
    */
  /** Session memo: the bucketed mart is a stored artifact like any
    * other — rebuild once per (warehouse, corpus fingerprint), then
    * reads are free. The mart's whole point is that the bucketing
    * shuffle is paid ONCE upstream, not per join (guide §2.4).
    */
  private val builtFor =
    new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  def writeBucketed(spark: SparkSession, dir: String,
      buckets: Int = 8): Unit = {
    val fp = graft.streaming.LedgerArtifacts.fingerprint(
      Tables.orders(spark, dir).select(col("o_orderkey")),
      Seq("o_orderkey"))
    val key = s"${spark.conf.get("spark.sql.warehouse.dir")}|$dir|" +
      s"$buckets|${fp._1}|${fp._2}"
    if (builtFor.containsKey(key) &&
        spark.catalog.tableExists("orders_bkt") &&
        spark.catalog.tableExists("lineitem_bkt")) return
    Seq("orders_bkt", "lineitem_bkt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    // a bucketed mart carries the columns its join family reads, not
    // the full fact width — in-bucket sorting full-width lineitem rows
    // triples the write for columns no consumer scans. Repartitioning
    // on the bucket key first (same Murmur3 hash as the bucket spec)
    // gives each write task exactly one bucket: the sort+write runs
    // `buckets`-wide instead of one-file-source = one serial task.
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), col("o_totalprice"))
      .repartition(buckets, col("o_orderkey"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bkt")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .repartition(buckets, col("l_orderkey"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bkt")
    builtFor.put(key, true)
  }

  /** Per-order revenue via the bucketed tables: join + aggregation both
    * run on the bucket key, so the physical plan contains no Exchange
    * at all — scan → (in-bucket sorted) sort-merge join → partial agg →
    * final agg, all bucket-local.
    */
  def coLocatedOrderRevenue(spark: SparkSession): DataFrame =
    spark.table("lineitem_bkt")
      .join(spark.table("orders_bkt"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(12,2)"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderkey"))
}
