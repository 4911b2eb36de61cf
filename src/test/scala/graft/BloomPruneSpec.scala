package graft

import graft.operators.BloomPrune
import graft.sources.Tables

/** The bloom runtime-filter prune must be result-transparent (no false
  * negatives, exact join clears false positives) and actually prune.
  */
class BloomPruneSpec extends SparkSpec {

  test("bloom-pruned revenue equals the plain semi-join bit-for-bit") {
    val pruned = BloomPrune.bloomPrunedRevenue(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = BloomPrune.plainRevenue(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(pruned.nonEmpty && pruned.sameElements(plain))
  }

  test("bloom keeps every true match and drops a real share of the probe") {
    import org.apache.spark.sql.functions._
    val survivors = BloomPrune.bloomSurvivorCount(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val total = li.count()
    val hot = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 400000.0).select(col("o_orderkey"))
    val trueMatches = li
      .join(hot, li("l_orderkey") === hot("o_orderkey"), "left_semi")
      .count()
    assert(survivors >= trueMatches, "bloom produced a false negative")
    // ~20% of orders qualify; a correctly sized filter (3% default fpp)
    // must reject most of the non-matching 80%
    assert(survivors < total / 2,
      s"bloom pruned nothing: $survivors of $total survive, $trueMatches match")
  }
}
