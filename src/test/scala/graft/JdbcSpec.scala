package graft

import org.apache.spark.sql.functions._

import graft.sources.{Jdbc, Tables}

/** JDBC source/sink round trip over Spark's bundled embedded Derby —
  * the engine-side stand-in for the reference's PostgreSQL layer.
  */
class JdbcSpec extends SparkSpec {

  test("customer table survives a JDBC write + partitioned parallel read") {
    val customer = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"))
    val url = Jdbc.tempDerbyUrl("spec")
    Jdbc.writeTable(customer, url, "customer_rt", maxConnections = 4)

    val bounds = customer
      .agg(min(col("c_custkey")), max(col("c_custkey"))).head()
    val back = Jdbc.readTable(spark, url, "customer_rt", "c_custkey",
      bounds.getLong(0), bounds.getLong(1), numPartitions = 4)

    // the partitioned read really fans out into N range scans
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == customer.count())
    // exact value round trip, both directions
    val a = customer.select(col("c_custkey"), col("c_name"),
      col("c_acctbal"), col("c_mktsegment"))
    val b = back.select(col("c_custkey"), col("c_name"),
      col("c_acctbal"), col("c_mktsegment"))
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
  }

  test("conflict-ignore upsert into a JDBC sink is idempotent") {
    // the reference's INSERT ... ON CONFLICT DO NOTHING against a real
    // JDBC table: anti-join the incoming batch against the sink's keys,
    // append only the novel rows — replaying the same batch is a no-op
    val url = Jdbc.tempDerbyUrl("upsert")
    val batch1 = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name")).filter(col("c_custkey") < 100)
    Jdbc.writeTable(batch1, url, "reg", maxConnections = 2)

    val batch2 = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name")).filter(col("c_custkey") < 150)
    def upsert(batch: org.apache.spark.sql.DataFrame): Unit = {
      val existing = Jdbc.readTableWhole(spark, url, "reg")
        .select(col("c_custkey").as("k"))
      val novel = batch.join(existing, col("c_custkey") === col("k"),
        "left_anti")
      Jdbc.writeTable(novel, url, "reg", maxConnections = 2)
    }
    upsert(batch2)
    assert(Jdbc.readTableWhole(spark, url, "reg").count() == 150)
    upsert(batch2) // replay: nothing new
    assert(Jdbc.readTableWhole(spark, url, "reg").count() == 150)
    // no duplicated keys
    assert(Jdbc.readTableWhole(spark, url, "reg")
      .select(col("c_custkey")).distinct().count() == 150)
  }

  test("q65 JDBC round trip equals the direct aggregation") {
    val direct = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"))
      .orderBy(col("event_type"))
    val viaJdbc = Jdbc.roundTripSummary(spark, sfDir)
    assert(direct.collect().toSeq == viaJdbc.collect().toSeq)
  }
}
