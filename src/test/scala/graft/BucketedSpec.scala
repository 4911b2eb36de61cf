package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketed

/** The point of bucketing is what's ABSENT from the plan: a fact-fact
  * join on the bucket key must contain zero Exchange (shuffle) nodes.
  */
class BucketedSpec extends SparkSpec {

  test("bucketed fact-fact join plans without any exchange") {
    // force the sort-merge path: a broadcast join would trivially have
    // no shuffle and prove nothing about co-location
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketed.writeBucketed(spark, sfDir)
      val df = Bucketed.coLocatedOrderRevenue(spark)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      // the presentation orderBy is allowed its range exchange; the join
      // + aggregation subtree must be exchange-free — count EVERY
      // Exchange (hash, single-partition, …) and require all of them to
      // be the allowed range partitioning
      val allExchanges = "Exchange ".r.findAllIn(plan).length
      val rangeExchanges = "Exchange rangepartitioning".r.findAllIn(plan).length
      assert(allExchanges == rangeExchanges,
        s"join/agg introduced a non-range exchange:\n$plan")

      // and the result is right: matches the plain (shuffling) join
      val expected = sources.Tables.lineitem(spark, sfDir)
        .join(sources.Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderkey"))
        .collect()
      val got = df.collect()
      assert(got.length == expected.length && got.nonEmpty)
      got.zip(expected).foreach { case (a, b) => assert(a == b) }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
