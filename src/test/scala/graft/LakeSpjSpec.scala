package graft

import org.apache.spark.sql.functions._

import graft.sources.lake.{GraftLake, LakeSpj}

/** The storage-partitioned-join contract: an identity-partitioned
  * lake scan reports key-grouped partitioning (one keyed split per
  * partition value), a co-partitioned join plans with ZERO shuffles
  * under the SPJ regime and with the usual two without it, results
  * agree either way, and the conf flips never leak out of the query
  * functions.
  */
class LakeSpjSpec extends SparkSpec {

  test("identity-partitioned scans plan one keyed split per value " +
      "and the co-partitioned join is shuffle-free with equal results") {
    import org.apache.spark.sql.connector.read.HasPartitionKey
    import graft.sources.lake.{LakeScanBuilder, LakeScan}
    val factRoot = LakeSpj.ensureFactTable(spark, sfDir)
    val meta = GraftLake.readMeta(factRoot)
    val nDays = meta.files.flatMap(_.pval).distinct.length
    assert(nDays > 1, "the events corpus must span several days")
    val sb = new LakeScanBuilder(factRoot)
    val scan = sb.build().asInstanceOf[LakeScan]
    val parts = scan.planInputPartitions()
    assert(parts.length == nDays)
    assert(parts.forall(_.isInstanceOf[HasPartitionKey]))
    val keys: Array[Long] = parts.map(
      _.asInstanceOf[HasPartitionKey].partitionKey().getLong(0))
    assert(keys.distinct.length == nDays)
    assert(keys.sorted.sameElements(keys), "splits ordered by value")
    // the audit's two regimes, re-run through the query surface
    val audit = LakeSpj.lakeSpjPlan(spark, sfDir).collect()
    val byMode = audit.map(r => r.getString(0) ->
      (r.getLong(2), r.getLong(3))).toMap
    assert(byMode("1_spj")._1 == 0L, "co-partitioned join: no shuffle")
    assert(byMode("2_shuffled")._1 == 2L, "control: both sides shuffle")
    assert(byMode("1_spj")._2 == byMode("2_shuffled")._2,
      "same rows either way")
    // conf flips must not leak (bench queries plan after this one)
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      != "-1")
    Caches.releaseAll(spark)
  }
}
