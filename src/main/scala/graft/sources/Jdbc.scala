package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink — the engine-side equivalent of the reference's
  * PostgreSQL persistence layer (`src/db.js:4-12`, pool write path
  * `src/services/saveToPostgres.js:315-409`). The container ships no
  * PostgreSQL server or driver, but Spark bundles Apache Derby, whose
  * embedded mode exercises the exact same `spark.read/write.format
  * ("jdbc")` surface a production deployment points at Postgres:
  *
  *  - write: per-partition batched INSERTs (`batchsize`), bounded
  *    connection fan-out (`numPartitions`) — the JDBC analogue of the
  *    reference's chunked pool writes;
  *  - read: predicate-partitioned parallel scan (`partitionColumn` /
  *    `lowerBound` / `upperBound` / `numPartitions`) so a large table
  *    arrives as N concurrent range queries, not one driver-side cursor.
  *
  * Swapping Derby for Postgres is a URL + driver-class change only.
  */
object Jdbc {

  /** Fresh embedded-Derby database under a temp directory; the log is
    * redirected there too so nothing touches the working directory.
    */
  def tempDerbyUrl(tag: String): String = {
    val dir = Files.createTempDirectory(s"graft_derby_${tag}_")
    System.setProperty("derby.stream.error.file", s"$dir/derby.log")
    // post-consumption hygiene: cleanly shut down THIS database (the
    // expected success signal is SQLState 08006, thrown), then hand
    // the directory to the temp-dir sweep (Caches runs hooks before
    // deleting tracked dirs, so the registration below is picked up
    // in the same releaseAll pass)
    graft.Caches.onRelease { () =>
      try java.sql.DriverManager
        .getConnection(s"jdbc:derby:$dir/db;shutdown=true")
      catch { case _: Throwable => () }
      graft.Caches.trackTempDir(dir)
      ()
    }
    s"jdbc:derby:$dir/db;create=true"
  }

  /** Executor-side batched append: each partition opens one connection
    * and writes `batchsize`-row INSERT batches — no driver collect.
    * `repartition` (not `coalesce`) bounds the connection fan-out: a
    * coalesce would propagate upstream and collapse the producing
    * computation to `maxConnections` tasks; the shuffle barrier keeps
    * upstream parallelism at cluster width and narrows only the write.
    */
  def writeTable(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000, maxConnections: Int = 8): Unit =
    df.repartition(maxConnections)
      .write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .mode("append")
      .save()

  /** Range-partitioned parallel read: Spark issues `numPartitions`
    * disjoint range queries on `partitionCol`, one per task.
    */
  def readTable(spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long,
      numPartitions: Int = 8, fetchSize: Int = 1000): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .option("fetchsize", fetchSize)
      .load()

  /** Single-partition read for small tables (dimension-sized). */
  def readTableWhole(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .load()

  /** Registered round trip (q65): aggregate events, persist the summary
    * through the JDBC sink, read it back through the JDBC source. The
    * returned rows are byte-identical to the direct aggregation (BIGINT
    * and DOUBLE survive JDBC exactly), which is what the oracle checks —
    * proving the reference's load-to-Postgres step (`saveToPostgres.js`)
    * has a working engine-side equivalent.
    */
  def roundTripSummary(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val summary = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"))
    val url = tempDerbyUrl("q65")
    writeTable(summary, url, "etype_summary", maxConnections = 4)
    readTableWhole(spark, url, "etype_summary")
      .select(col("event_type"), col("n_events"), col("total_value"),
        col("min_event_id"), col("max_event_id"))
      .orderBy(col("event_type"))
  }
}
