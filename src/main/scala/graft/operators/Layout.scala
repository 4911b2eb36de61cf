package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Physical-layout and skew advisors (q416–q418, block 32): the
  * sizing decisions this library makes by configuration
  * (`spark.sql.files.maxPartitionBytes`, `shuffle.partitions`,
  * salting) computed as first-class tables — at 100 TB these are
  * artifacts a deployment regenerates per corpus snapshot, not
  * numbers a human guesses.
  *
  * All integer arithmetic (`div`-exact), so every advisor is
  * hash-oracled.
  */
object Layout {

  /** Target file payload for the writer plan, in characters (the
    * fixture's byte proxy — documents carry n_chars; a production run
    * keys on bytes, same arithmetic).
    */
  private val TargetCharsPerFile = 250000L

  /** Rows-per-shuffle-task budget for the partition advisor. */
  private val RowsPerTask = 50000L

  /** Hot-key cap for the salt plan: a key with more rows than this
    * is salted into ceil(cnt/cap)-way subsplits. Keyed on event_type
    * — the genuinely skewed join key on this schema (user_id is
    * uniform; a type-dimension join piles every row of a type onto
    * one task).
    */
  private val SaltCap = 100L

  /** Partition/file sizing plan (q416): per source — docs, char mass,
    * target output files at the payload budget (ceil), and the
    * resulting per-file averages. The writer-side sibling of
    * `maxPartitionBytes`: the table that keeps a 100 TB copy job from
    * emitting either 10M tiny files or 50 GB monsters.
    */
  def partitionPlan(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("source"), col("n_docs"), col("n_chars"),
        expr(s"(n_chars + ${TargetCharsPerFile - 1}L) div " +
          s"${TargetCharsPerFile}L").as("n_files"))
      .select(col("source"), col("n_docs"), col("n_chars"),
        col("n_files"),
        expr("n_docs div n_files").as("docs_per_file"),
        expr("n_chars div n_files").as("chars_per_file"))
      .orderBy(col("source"))

  /** Skew salt plan (q417): the events event_type histogram folded
    * into a salting decision — per hot key (row count > SaltCap), the
    * salt fan-out ceil(cnt/cap). The input to the q294-style
    * skew-aware shuffle: hot keys explode into `salt` sub-keys, the
    * long tail shuffles as-is.
    */
  def saltPlan(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > SaltCap)
      .select(col("event_type"), col("n_rows"),
        expr(s"(n_rows + ${SaltCap - 1}L) div ${SaltCap}L").as("salt"))
      .orderBy(col("n_rows").desc, col("event_type"))

  /** q477: table statistics collection — the ANALYZE TABLE artifact
    * a cost-based planner feeds on (the q409 join planner computes
    * its stats live; a production deployment materializes them per
    * snapshot, and this is that table). Per documents column: rows,
    * exact NDV (an HLL at 100 TB — same table shape, sketched
    * column), nulls, and average value length in hundredths (integer
    * `(Σ length · 100) div n`, hash-oracled).
    */
  def tableStats(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.sources.Tables.documents(spark, dir).persist()
    val cols = Seq("doc_id", "lang", "source", "n_chars", "text")
    cols.map { c =>
      d.agg(count(lit(1)).as("n_rows"),
          countDistinct(col(c)).as("ndv"),
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
            .as("n_nulls"),
          expr(s"(sum(length(cast($c as string))) * 100L) div " +
            "count(1)").as("avg_len_x100"))
        .select(lit(c).as("column_name"), col("n_rows"), col("ndv"),
          col("n_nulls"), col("avg_len_x100"))
    }.reduce(_.unionByName(_)).orderBy(col("column_name"))
  }

  /** Shuffle-partition advisor (q418): per join/agg input relation,
    * the task count at the rows-per-task budget (ceil, floor 1) —
    * the `spark.sql.shuffle.partitions` sizing table, per relation
    * instead of one global number (what AQE coalescing approximates
    * at runtime; this is the planning-time view).
    */
  def shuffleAdvisor(spark: SparkSession, dir: String): DataFrame = {
    def rel(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_rows"))
        .select(lit(name).as("relation"), col("n_rows"),
          greatest(lit(1L),
            expr(s"(n_rows + ${RowsPerTask - 1}L) div ${RowsPerTask}L"))
            .as("n_tasks"))
    rel("customer", Tables.customer(spark, dir))
      .unionByName(rel("documents", Tables.documents(spark, dir)))
      .unionByName(rel("embeddings", Tables.embeddings(spark, dir)))
      .unionByName(rel("events", Tables.events(spark, dir)))
      .unionByName(rel("lineitem", Tables.lineitem(spark, dir)))
      .unionByName(rel("orders", Tables.orders(spark, dir)))
      .orderBy(col("relation"))
  }
}
