package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.LedgerArtifacts

/** Join statistics planner (q409): the table a 100 TB deployment
  * reads before picking physical join strategies — per declared FK
  * edge, fact-side volume, key cardinality, worst-key multiplicity,
  * dim-side volume, an exact integer skew factor
  * (1000 · max/avg with the divide-first integer arithmetic), and the
  * rule-based recommendation (broadcast the dim when it fits the
  * broadcast budget; salt the shuffle when one key dominates). The
  * q293 FK-edge declaration plus the q294 skew discipline, composed
  * into the decision table; the thresholds mirror what this library
  * already does by hand (`broadcast()` on every dim below the budget,
  * salting on skewed keys).
  *
  * The CBO loop (r15 verdict #4): the edge stats are a STORED
  * artifact, not a per-call recompute — collected once per corpus
  * snapshot (the q477 ANALYZE discipline), committed under the same
  * fingerprint-freshness contract as the dup-edge artifact, and read
  * back by every subsequent plan (q409's report, q437's conformance
  * audit). A corpus change flips the fingerprint and the next call
  * recollects; JoinPlannerSpec pins build-once, stale-fallback, and
  * read-path parity with a fresh recompute.
  *
  * 100 TB shape: statistics collection is one key-grain collapse per
  * edge (map-side combined, #edges rows out) — a linear pass a real
  * deployment schedules, which is exactly why the artifact is stored;
  * consuming it is a metadata read. The freshness probe here is a
  * narrow key-column scan per table; a production lakehouse gets the
  * same signal free from table-format snapshot ids.
  */
object JoinPlanner {

  /** Broadcast budget in ROWS — the stand-in for
    * spark.sql.autoBroadcastJoinThreshold's byte budget (exact and
    * cross-engine; bytes are layout-dependent).
    */
  private val BroadcastRows = 100000L
  private val SkewX1000 = 16000L

  /** The declared FK edges: (name, fact, fact key, dim, dim key) —
    * shared by the stats planner (q409) and the plan-conformance
    * audit (q437).
    */
  private[operators] def fkEdges(spark: SparkSession, dir: String)
      : Seq[(String, DataFrame, String, DataFrame, String)] = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val part = Tables.part(spark, dir)
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    val ev = Tables.events(spark, dir)
    Seq(
      ("customer.c_nationkey->nation", cust, "c_nationkey", nat,
        "n_nationkey"),
      ("events.user_id->customer", ev, "user_id", cust, "c_custkey"),
      ("lineitem.l_orderkey->orders", li, "l_orderkey", ord,
        "o_orderkey"),
      ("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey"),
      ("lineitem.l_suppkey->supplier", li, "l_suppkey", supp,
        "s_suppkey"),
      ("nation.n_regionkey->region", nat, "n_regionkey", reg,
        "r_regionkey"),
      ("orders.o_custkey->customer", ord, "o_custkey", cust,
        "c_custkey"),
      ("supplier.s_nationkey->nation", supp, "s_nationkey", nat,
        "n_nationkey"))
  }

  /** Build counter for the stored stats — spec hook only. */
  private val statsBuilds =
    new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] def statsBuildCount: Long = statsBuilds.get

  /** One fresh collection pass: the per-edge stat collapse. */
  private def collectEdgeStats(spark: SparkSession,
      dir: String): DataFrame = {
    def edge(name: String, fact: DataFrame, key: String,
        dim: DataFrame): DataFrame = {
      val facts = fact.groupBy(col(key).as("k"))
        .agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("fact_rows"),
          count(lit(1)).as("fact_keys"),
          max(col("cnt")).as("max_mult"))
      val dims = dim.agg(count(lit(1)).as("dim_rows"))
      facts.crossJoin(dims)
        .select(lit(name).as("relation"), col("fact_rows"),
          col("fact_keys"), col("max_mult"), col("dim_rows"),
          // divide BEFORE multiplying: max_mult·fact_keys·1000 at
          // 100 TB (fact_keys ~1e10) overflows Long; 1000·max/avg with
          // the integer avg (fact_rows div fact_keys ≥ 1 whenever keys
          // exist) keeps every intermediate ≤ 1000·max_mult. Empty
          // fact ⇒ skew 0, not a division error.
          expr("CASE WHEN fact_keys > 0 THEN (max_mult * 1000L) div " +
            "(fact_rows div fact_keys) ELSE 0L END")
            .as("skew_x1000"))
    }
    fkEdges(spark, dir)
      .map { case (name, fact, key, dim, _) => edge(name, fact, key, dim) }
      .reduce(_.unionByName(_))
  }

  /** Combined corpus fingerprint over every key column any edge
    * reads — narrow scans only; any added/removed/rekeyed row in any
    * joined table flips it.
    */
  private def corpusFingerprint(spark: SparkSession,
      dir: String): String = {
    val parts = Seq(
      ("customer", Tables.customer(spark, dir),
        Seq("c_custkey", "c_nationkey")),
      ("events", Tables.events(spark, dir), Seq("user_id")),
      ("lineitem", Tables.lineitem(spark, dir),
        Seq("l_orderkey", "l_partkey", "l_suppkey")),
      ("nation", Tables.nation(spark, dir),
        Seq("n_nationkey", "n_regionkey")),
      ("orders", Tables.orders(spark, dir),
        Seq("o_orderkey", "o_custkey")),
      ("part", Tables.part(spark, dir), Seq("p_partkey")),
      ("region", Tables.region(spark, dir), Seq("r_regionkey")),
      ("supplier", Tables.supplier(spark, dir),
        Seq("s_suppkey", "s_nationkey")))
    val body = parts.map { case (n, df, cols) =>
      val (c, h) = LedgerArtifacts.fingerprint(
        df.select(cols.map(col): _*), cols)
      s"$n:$c:$h"
    }.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(body.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Committed-and-current check: meta present (commit marker), its
    * fingerprint matches, the stats table committed.
    */
  private def fresh(spark: SparkSession, path: String,
      fp: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(s"$path/meta/_SUCCESS")) &&
      fs.exists(new Path(s"$path/stats/_SUCCESS")) && {
        val m = spark.read.parquet(s"$path/meta").collect()
        m.length == 1 && m(0).getString(0) == fp
      }
  }

  /** The stored edge-stats artifact: read when fresh, recollect and
    * commit (stats first, meta marker last — a crash leaves a
    * missing/mismatched meta and the next caller recollects) when the
    * corpus changed or no artifact exists.
    */
  private[graft] def edgeStatsArtifact(spark: SparkSession,
      dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val path = s"${LedgerArtifacts.artifactRoot}/join_stats_" +
      LedgerArtifacts.dirKey(dir)
    val fp = corpusFingerprint(spark, dir)
    if (!fresh(spark, path, fp)) synchronized {
      if (!fresh(spark, path, fp)) {
        statsBuilds.incrementAndGet()
        val t0 = System.nanoTime()
        val fs = new Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new Path(s"$path/meta"), true)
        collectEdgeStats(spark, dir).coalesce(1)
          .write.mode("overwrite").parquet(s"$path/stats")
        import spark.implicits._
        Seq(fp).toDF("fingerprint").coalesce(1)
          .write.mode("overwrite").parquet(s"$path/meta")
        graft.ArtifactLog.record("join_stats",
          (System.nanoTime() - t0) / 1e9)
      }
    }
    spark.read.parquet(s"$path/stats")
  }

  /** Re-analyze when the fact grew past this (per-mille growth). */
  private val ReanalyzeAtX1000 = 200L

  /** q504: the ANALYZE cadence — the q476 staleness shape for the
    * CBO. Stored stats were collected at the last-analyze boundary
    * (the orders-key-domain prefix, batches 0–1 of the deterministic
    * split — the only data the ANALYZE job saw); the table kept
    * growing. Per key-domain edge: the stale and fresh fact volumes,
    * the integer growth rate, and the re-analyze verdict — the row
    * that tells an operator WHEN the q409 artifact stops being
    * trustworthy, before a misplanned join tells them the hard way.
    *
    * 100 TB shape: the stale side is the stored artifact's numbers
    * (metadata); the fresh side is one count per fact — the cheapest
    * staleness probe there is (a lakehouse reads it off snapshot
    * metadata for free).
    */
  def statsStalenessAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val bound = broadcast(o.agg(
      expr("2L * ((max(o_orderkey) + 3L) div 3L)").as("bound")))
    def edge(name: String, fact: DataFrame, key: String): DataFrame =
      fact.crossJoin(bound)
        .agg(
          sum(when(col(key) < col("bound"), 1L).otherwise(0L))
            .as("fact_rows_stale"),
          count(lit(1)).as("fact_rows_fresh"))
        .select(lit(name).as("relation"), col("fact_rows_stale"),
          col("fact_rows_fresh"),
          expr("CASE WHEN fact_rows_stale > 0 THEN " +
            "((fact_rows_fresh - fact_rows_stale) * 1000L) div " +
            "fact_rows_stale ELSE 1000L END").as("growth_x1000"))
        .withColumn("reanalyze",
          col("growth_x1000") > ReanalyzeAtX1000)
    edge("lineitem.l_orderkey->orders", li, "l_orderkey")
      .unionByName(edge("lineitem.l_partkey->part", li, "l_orderkey"))
      .unionByName(edge("lineitem.l_suppkey->supplier", li,
        "l_orderkey"))
      .unionByName(edge("orders.o_custkey->customer", o, "o_orderkey"))
      .orderBy(col("relation"))
  }

  /** q409: the decision table — stored stats plus the rule-based
    * recommendation derived at read time (policy thresholds are
    * code, not data: retuning them must not invalidate the artifact).
    */
  def joinStatsPlanner(spark: SparkSession, dir: String): DataFrame =
    edgeStatsArtifact(spark, dir)
      .withColumn("recommend",
        when(col("dim_rows") <= BroadcastRows,
          "broadcast_dim")
          .when(col("skew_x1000") > SkewX1000, "shuffle_salted")
          .otherwise("shuffle_hash"))
      .orderBy(col("relation"))
}
