package graft.sources.lake

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.ZoneMap
import graft.streaming.LedgerArtifacts

/** The MEDALLION LOOP on the lake format (block 111, q562/q563) —
  * the reference's E1 incremental pipeline (watermark → fetch delta
  * → upsert → advance watermark; `controller.js:17-60`) re-expressed
  * END TO END on the engine's own table format:
  *
  *  - BRONZE: the DSv2-written orders table (q534's fixture) — three
  *    append snapshots;
  *  - SILVER: a per-custkey summary lake table whose refresh reads
  *    ONLY the bronze delta (`changesFrom` — block 108's manifest
  *    diff), folds it into the current summaries, and commits
  *    through MERGE (block 104) with a batch id that ENCODES the
  *    consumed version range — the cursor IS the commit trail, so a
  *    crashed refresh replays idempotently and a caught-up loop
  *    no-ops.
  *
  * At 100 TB each cycle's cost is proportional to the DELTA (the
  * appended files + the touched silver files), never to either
  * table's size — the whole point of the reference's watermark
  * design, with the watermark now carried by the format itself.
  */
object LakeMedallion {

  private val SilverSchema = StructType(Seq(
    StructField("o_custkey", LongType),
    StructField("n_orders", LongType),
    StructField("sum_ok", LongType)))

  /** One refresh cycle: fold bronze changes (cursor, upTo] into
    * silver. Returns (fromVersion, toVersion, silverVersion), or
    * None when the loop is already caught up.
    */
  def refresh(spark: SparkSession, bronze: String, silver: String,
      upTo: Option[Long] = None): Option[(Long, Long, Long)] = {
    val fs = new HPath(silver).getFileSystem(GraftLake.hadoopConf)
    val sMeta = GraftLake.readMeta(silver)
    // the consumer cursor: the latest refresh commit's id encodes
    // the bronze version range it consumed
    val cursor = sMeta.props.get("batch_id")
      .filter(_.startsWith("refresh-"))
      .map(_.split('-')(2).toLong).getOrElse(0L)
    val bfs = new HPath(bronze).getFileSystem(GraftLake.hadoopConf)
    val target = upTo.getOrElse(
      GraftLake.committedVersions(bfs, bronze).max)
    if (target <= cursor) return None
    val delta = GraftLake
      .dfChangesFrom(spark, bronze, cursor, Some(target))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("d_n"), sum(col("o_orderkey")).as("d_sum"))
    val merged = delta
      .join(GraftLake.dfFor(spark, silver), Seq("o_custkey"), "left")
      .select(col("o_custkey"),
        (coalesce(col("n_orders"), lit(0L)) + col("d_n"))
          .as("n_orders"),
        (coalesce(col("sum_ok"), lit(0L)) + col("d_sum"))
          .as("sum_ok"))
    LakeMerge.merge(spark, silver, merged, "o_custkey",
      s"refresh-$cursor-$target").map(r => (cursor, target, r._3))
  }

  /** The silver table: created empty, then TWO refresh cycles
    * against the shared bronze (versions 0→2, then 2→3), then the
    * caught-up loop re-invoked — which must no-op.
    */
  def ensureSilverTable(spark: SparkSession, dir: String): String = {
    val bronze = GraftLake.ensureWriteTable(spark, dir)
    val fp = LedgerArtifacts.fingerprint(ZoneMap.orders(spark, dir),
      Seq("o_orderkey", "o_custkey"))
    GraftLake.ensureLake(spark,
      s"lake2_silver_${LedgerArtifacts.dirKey(dir)}", fp) {
      (fs, staging) =>
        GraftLake.createTable(fs, staging, SilverSchema,
          Seq("o_custkey"), Some("o_custkey"))
        val c1 = refresh(spark, bronze, staging, Some(2L))
        require(c1.exists(r => r._1 == 0L && r._2 == 2L),
          "medallion fixture: cycle 1 must consume (0,2]")
        val c2 = refresh(spark, bronze, staging, None)
        require(c2.exists(r => r._1 == 2L && r._2 == 3L),
          "medallion fixture: cycle 2 must consume (2,3]")
        require(refresh(spark, bronze, staging, None).isEmpty,
          "medallion fixture: a caught-up loop must no-op")
    }
  }

  /** q562: the silver state after both cycles — bucket rollup over
    * the per-custkey summaries, which must equal a FULL recompute
    * from raw orders (DuckDB): incremental folding loses or doubles
    * nothing.
    */
  def lakeMedallionState(spark: SparkSession,
      dir: String): DataFrame =
    GraftLake.dfFor(spark, ensureSilverTable(spark, dir))
      .groupBy((col("o_custkey") % 8L).as("bucket"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("n_orders")).as("n_orders"),
        sum(col("sum_ok")).as("sum_ok"))
      .orderBy(col("bucket"))

  /** q563: the refresh trail — per silver snapshot: rows, the
    * consumed-through cursor (decoded from the commit id), and the
    * committed version count pinning the caught-up no-op (3, not 4).
    */
  def lakeMedallionAudit(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val root = ensureSilverTable(spark, dir)
    val fs = new HPath(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nVersions = GraftLake.committedVersions(fs, root)
      .length.toLong
    (0L to 2L).map { v =>
      val m = GraftLake.readMeta(root, Some(v))
      val cursor = m.props.get("batch_id")
        .filter(_.startsWith("refresh-"))
        .map(_.split('-')(2).toLong).getOrElse(0L)
      (v, m.files.map(_.liveRows).sum, cursor, nVersions)
    }.toDF("version", "n_rows", "cursor", "versions_committed")
      .orderBy(col("version"))
  }
}
