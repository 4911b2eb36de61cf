package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bloom-filter file skipping + materialized-view rewrite
  * (q466–q467, block 55).
  *
  * q466 completes the data-skipping trio. Zone maps (q439) prune
  * RANGE predicates on clustered columns and partition values (q459)
  * prune their own column — but a POINT lookup on a column scattered
  * uniformly across files (exactly q440's custkey finding: every
  * file spans the whole domain) gets nothing from either. The
  * standard fix is a per-file Bloom filter (parquet bloom_filter /
  * Delta BLOOMFILTER index): k hash bits per key, a file is admitted
  * iff every probe bit is set — no false negatives ever (the
  * skipping guarantee), false positives at a rate the m/n/k sizing
  * controls. Fixture: m = 4096 bits (3 md5 nibbles — the q253
  * deterministic-hash discipline, identical in the oracle), k = 2
  * (two disjoint nibble triples of the same digest), files = the
  * q439 orderkey-linear layout, probes = 8 derived custkeys. The
  * census reports, per probe, files admitted vs files truly
  * containing the key — the FP overhead is the audit's whole point.
  *
  * q467 is the materialized-view rewrite law: an MV at the
  * (source, lang) grain answers any query grouping by a SUBSET of
  * its keys by re-aggregating the MV (additive measures), never
  * rescanning the base. The parity row per source carries both
  * paths' answers side by side; one row of drift breaks the hash.
  *
  * 100 TB shape: bloom bit-sets are per-file metadata (m bits/file)
  * probed by a broadcast of the lookup keys; the MV path aggregates
  * #grain rows instead of #base rows — the 1000× the rewrite exists
  * to win.
  */
object BloomSkipping {

  private val RowsPerFile = 256L

  /** 3-nibble (12-bit, m = 4096) hash of a custkey with salt `s`. */
  private def bloomBit(s: String): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit(s), col("o_custkey").cast("string"))),
      1, 3), 16, 10).cast("long")

  private def filed(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "orders")
      .select(col("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"))
      .withColumn("rn",
        row_number().over(Window.orderBy(col("o_orderkey"))).cast("long"))
      .withColumn("file_id", expr(s"(rn - 1L) div ${RowsPerFile}L"))
      .drop("rn")

  /** q466: the bloom skipping census — per probed custkey, how many
    * files the per-file bloom admits, how many truly contain it, and
    * the false-positive overhead. `n_admitted >= n_true` always (no
    * false negatives); the gap is the sizing trade.
    */
  def bloomFileSkipping(spark: SparkSession, dir: String): DataFrame = {
    val docs = filed(spark, dir).persist()
    // per-file bloom bit sets: 2 salted 12-bit hashes per key
    val bits = docs.select(col("file_id"), bloomBit("b1|").as("bit"))
      .unionByName(docs.select(col("file_id"), bloomBit("b2|").as("bit")))
      .distinct()
    // 8 derived probe keys: k·max/8, k = 1..8
    val probes = docs.agg(max(col("o_custkey")).as("maxv"))
      .crossJoin(spark.range(1, 9).select(col("id").as("k")))
      .select(expr("(k * maxv) div 8L").as("o_custkey"))
    val probeBits = probes
      .select(col("o_custkey"), bloomBit("b1|").as("bit"))
      .unionByName(probes
        .select(col("o_custkey"), bloomBit("b2|").as("bit")))
      .distinct()
    val needed = probeBits.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_bits"))
    val admitted = bits.join(broadcast(probeBits), Seq("bit"))
      .groupBy(col("o_custkey"), col("file_id"))
      .agg(count(lit(1)).as("n_hit"))
      .join(broadcast(needed), Seq("o_custkey"))
      .filter(col("n_hit") === col("n_bits"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_admitted"))
    val truly = docs.join(broadcast(probes.distinct()), Seq("o_custkey"))
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("file_id")).as("n_true"))
    probes.distinct()
      .join(admitted, Seq("o_custkey"), "left")
      .join(truly, Seq("o_custkey"), "left")
      .na.fill(0L, Seq("n_admitted", "n_true"))
      .select(col("o_custkey").as("probe_key"), col("n_admitted"),
        col("n_true"),
        (col("n_admitted") - col("n_true")).as("n_false_positive"))
      .orderBy(col("probe_key"))
  }

  /** q467: MV rewrite parity — the (source, lang) materialized view
    * re-aggregated to the source grain next to the base-table answer.
    */
  def mvRewriteParity(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .persist()
    val mv = base.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
    val viaMv = mv.groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs_mv"),
        sum(col("n_chars")).as("n_chars_mv"))
    val viaBase = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_base"),
        sum(col("n_chars")).as("n_chars_base"))
    viaMv.join(viaBase, Seq("source"))
      .select(col("source"), col("n_docs_mv"), col("n_docs_base"),
        col("n_chars_mv"), col("n_chars_base"))
      .orderBy(col("source"))
  }
}
