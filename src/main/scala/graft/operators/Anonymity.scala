package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** k-anonymity / l-diversity release audit (q444–q446, block 46).
  *
  * The PII family (q345–q349) finds and redacts IDENTIFIERS; erasure
  * (q386+) deletes on request. What neither covers is the
  * re-identification risk of the rows you KEEP: a released table is
  * k-anonymous when every combination of quasi-identifiers (columns an
  * adversary can know from elsewhere — demographics, region, coarse
  * account stats) is shared by at least k rows, and l-diverse when no
  * equivalence class is homogeneous in a sensitive attribute (class
  * size alone doesn't stop attribute disclosure if all k members share
  * the secret). Sweeney's k-anonymity and the Machanavajjhala et al.
  * l-diversity refinement, computed as plain aggregations.
  *
  * Fixture mapping on `customer`: quasi-identifiers are nationality
  * (c_nationkey), market segment, and the account-balance bucket;
  * the sensitive attribute for l-diversity is the market segment
  * (with nationality + balance as the adversary's keys). The
  * generalization ladder is the standard fix: coarsen the QIs level
  * by level (nation → region, finer → coarser balance buckets, drop
  * columns) until the k floor holds, and release at the first level
  * that does.
  *
  * Everything is grouping + counting — exact, integer, oracled.
  *
  * 100 TB shape: each level is ONE map-side-combined groupBy over
  * narrow columns (the QI projection); the ladder is 4 such passes
  * (or one pass with grouping sets); the violating-class work lists
  * are tiny by construction (they are the rare combinations). Nothing
  * shuffles row payloads.
  */
object Anonymity {

  /** The release bar: every QI class must have at least K members. */
  private val K = 5L

  private[graft] def customers(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "customer")
      .join(Tables.read(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .select(
        col("c_custkey"),
        col("c_nationkey").cast("long").as("nation"),
        col("n_regionkey").cast("long").as("region"),
        col("c_mktsegment").as("segment"),
        col("c_acctbal"))

  /** QI projection at one generalization level. Levels:
    * 0 = (nation, segment, bal/1000) — the release as-is;
    * 1 = (region, segment, bal/2500);
    * 2 = (region, segment, bal/5000);
    * 3 = (region, -, bal/5000) — segment suppressed.
    */
  private def qiCols(level: Int): Seq[Column] = level match {
    case 0 => Seq(col("nation").as("qi_geo"), col("segment").as("qi_seg"),
      floor(col("c_acctbal") / 1000.0).cast("long").as("qi_bal"))
    case 1 => Seq(col("region").as("qi_geo"), col("segment").as("qi_seg"),
      floor(col("c_acctbal") / 2500.0).cast("long").as("qi_bal"))
    case 2 => Seq(col("region").as("qi_geo"), col("segment").as("qi_seg"),
      floor(col("c_acctbal") / 5000.0).cast("long").as("qi_bal"))
    case _ => Seq(col("region").as("qi_geo"), lit("*").as("qi_seg"),
      floor(col("c_acctbal") / 5000.0).cast("long").as("qi_bal"))
  }

  /** q444: the level-0 violation work list — every QI class below the
    * k=5 floor, i.e. the rows whose release would re-identify. The
    * k-anonymity analogue of the PII sweep's findings table.
    */
  def kanonAudit(spark: SparkSession, dir: String): DataFrame =
    customers(spark, dir)
      .groupBy(qiCols(0): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < K)
      .orderBy(col("qi_geo"), col("qi_seg"), col("qi_bal"))

  /** The finest QI cell grain — every ladder level and the
    * l-diversity facet aggregate FROM these cells, so the same rows
    * can be maintained as streaming sum-merge state (q455–q456) with
    * the batch queries' SQL as the oracle for any micro-batching.
    * All three balance buckets ride the key because 2500 and 5000 are
    * not multiples of 1000: coarser levels cannot be derived from the
    * finest bucket alone.
    */
  private[graft] def qiCellsOf(rows: DataFrame): DataFrame =
    rows.groupBy(col("nation"), col("region"), col("segment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("b1000"),
        floor(col("c_acctbal") / 2500.0).cast("long").as("b2500"),
        floor(col("c_acctbal") / 5000.0).cast("long").as("b5000"))
      .agg(count(lit(1)).as("cnt"))

  /** Cell-grain key columns for one ladder level (see [[qiCols]]). */
  private def cellQi(level: Int): Seq[Column] = level match {
    case 0 => Seq(col("nation").as("qi_geo"), col("segment").as("qi_seg"),
      col("b1000").as("qi_bal"))
    case 1 => Seq(col("region").as("qi_geo"), col("segment").as("qi_seg"),
      col("b2500").as("qi_bal"))
    case 2 => Seq(col("region").as("qi_geo"), col("segment").as("qi_seg"),
      col("b5000").as("qi_bal"))
    case _ => Seq(col("region").as("qi_geo"), lit("*").as("qi_seg"),
      col("b5000").as("qi_bal"))
  }

  /** The q445 ladder computed from QI cells (batch or streamed). */
  private[graft] def ladderFromCells(cells: DataFrame): DataFrame = {
    val c = cells.persist()
    val perLevel = (0 to 3).map { lvl =>
      c.groupBy(cellQi(lvl): _*)
        .agg(sum(col("cnt")).as("class_size"))
        .agg(
          count(lit(1)).as("n_classes"),
          min(col("class_size")).as("min_class_size"),
          coalesce(sum(when(col("class_size") < K,
            col("class_size")).otherwise(0L)), lit(0L))
            .as("n_violating_rows"),
          coalesce(sum(when(col("class_size") < K, 1L)
            .otherwise(0L)), lit(0L)).as("n_violating_classes"))
        .select(lit(lvl.toLong).as("level"), col("n_classes"),
          col("min_class_size"), col("n_violating_classes"),
          col("n_violating_rows"))
    }.reduce(_.unionByName(_))
    val chosen = perLevel
      .filter(col("n_violating_classes") === 0L)
      .agg(coalesce(min(col("level")), lit(-1L)).as("chosen_level"))
    perLevel.crossJoin(broadcast(chosen))
      .select(col("level"), col("n_classes"), col("min_class_size"),
        col("n_violating_classes"), col("n_violating_rows"),
        (col("level") === col("chosen_level")).as("chosen"))
      .orderBy(col("level"))
  }

  /** q445: the generalization ladder — per level, the class census
    * (classes, smallest class, rows in violating classes) and whether
    * the k floor holds; `chosen` marks the first passing level, the
    * release decision. All four levels in one result so the
    * cost-of-privacy trade (fewer, coarser classes) is one table.
    */
  def kanonGeneralize(spark: SparkSession, dir: String): DataFrame =
    ladderFromCells(qiCellsOf(customers(spark, dir)))

  /** The q446 l-diversity facet computed from QI cells. */
  private[graft] def lDiversityFromCells(cells: DataFrame): DataFrame =
    cells.groupBy(col("nation").as("qi_geo"),
        col("b1000").as("qi_bal"))
      .agg(sum(col("cnt")).as("class_size"),
        countDistinct(col("segment")).as("l_distinct"))
      .filter(col("l_distinct") < 2L)
      .orderBy(col("qi_geo"), col("qi_bal"))

  /** q458: the release executor — act on the audit the way the PII
    * family's redacted-copy writer acts on its sweep. At the level-2
    * generalization, classes at or above the k floor are released
    * as-is and sub-k classes are SUPPRESSED (the standard
    * cell-suppression fallback when further coarsening would destroy
    * utility); the census per region is the release's datasheet row:
    * how many rows shipped, how many were withheld, in how many
    * classes each.
    */
  def kanonRelease(spark: SparkSession, dir: String): DataFrame =
    qiCellsOf(customers(spark, dir))
      .groupBy(col("region").as("qi_geo"), col("segment").as("qi_seg"),
        col("b5000").as("qi_bal"))
      .agg(sum(col("cnt")).as("class_size"))
      .withColumn("released", col("class_size") >= K)
      .groupBy(col("qi_geo"))
      .agg(
        coalesce(sum(when(col("released"), 1L).otherwise(0L)), lit(0L))
          .as("n_released_classes"),
        coalesce(sum(when(col("released"), col("class_size"))
          .otherwise(0L)), lit(0L)).as("n_released_rows"),
        coalesce(sum(when(!col("released"), 1L).otherwise(0L)), lit(0L))
          .as("n_suppressed_classes"),
        coalesce(sum(when(!col("released"), col("class_size"))
          .otherwise(0L)), lit(0L)).as("n_suppressed_rows"))
      .orderBy(col("qi_geo"))

  /** q446: l-diversity at the adversary keys (nation, bal/1000) with
    * the market segment as the sensitive attribute — classes that are
    * k-anonymous can still leak the segment if homogeneous. Work list
    * of classes with fewer than 2 distinct sensitive values (plus
    * their size), i.e. attribute disclosure even without
    * re-identification.
    */
  def lDiversity(spark: SparkSession, dir: String): DataFrame =
    customers(spark, dir)
      .groupBy(col("nation").as("qi_geo"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("qi_bal"))
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("segment")).as("l_distinct"))
      .filter(col("l_distinct") < 2L)
      .orderBy(col("qi_geo"), col("qi_bal"))
}
