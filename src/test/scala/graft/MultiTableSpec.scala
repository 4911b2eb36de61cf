package graft

import org.apache.spark.sql.functions._

import graft.streaming.MultiTable

/** Crash-window properties of the multi-table commit (q450–q451)
  * beyond the per-query oracles: the half-committed version is
  * invisible at the crash point, recovery is idempotent, and the
  * manifest trail monotonically advances both tables together.
  */
class MultiTableSpec extends SparkSpec {

  test("crash window: reader sees txn 0 for BOTH tables despite cnt's v1 on disk") {
    val root = MultiTable.runToCrash(spark, sfDir)
    // the uncommitted v1 exists physically...
    import org.apache.hadoop.fs.Path
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$root/cnt/b1_1/_SUCCESS")))
    // ...but the manifest still resolves both tables to v0
    val (k, m) = MultiTable.latestManifest(spark, root).get
    assert(k === 0L)
    assert(m === Map("cnt" -> 0L, "pri" -> 0L))
    // and the sanctioned read path returns the v0 fold exactly
    val massCnt = MultiTable.readTable(spark, root, "cnt")
      .agg(sum(col("n_orders"))).collect()(0).getLong(0)
    val massPri = MultiTable.readTable(spark, root, "pri")
      .agg(sum(col("n_orders"))).collect()(0).getLong(0)
    assert(massCnt === massPri) // same fact mass through both grains
    val v0Rows = spark.read.parquet(s"$root/cnt/b0_0")
      .agg(sum(col("n_orders"))).collect()(0).getLong(0)
    assert(massCnt === v0Rows)
    Caches.releaseAll(spark)
  }

  test("recovery is idempotent and advances both tables together") {
    val root = MultiTable.runToCrash(spark, sfDir)
    MultiTable.recover(spark, sfDir, root)
    val (k1, m1) = MultiTable.latestManifest(spark, root).get
    assert(k1 === 1L)
    assert(m1 === Map("cnt" -> 1L, "pri" -> 1L))
    val mass1 = MultiTable.readTable(spark, root, "cnt")
      .agg(sum(col("n_orders"))).collect()(0).getLong(0)
    // run recovery AGAIN (the retry a crashed recoverer performs)
    MultiTable.recover(spark, sfDir, root)
    val (k2, m2) = MultiTable.latestManifest(spark, root).get
    assert(m2 === m1)
    val mass2 = MultiTable.readTable(spark, root, "cnt")
      .agg(sum(col("n_orders"))).collect()(0).getLong(0)
    assert(mass2 === mass1)
    // post-recovery mass equals the full orders count
    val full = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(mass1 === full)
    Caches.releaseAll(spark)
  }
}
