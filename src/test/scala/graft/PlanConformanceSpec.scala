package graft

import org.apache.spark.sql.functions._

import graft.operators.PlanConformance

/** The q437 conformance extractor must read the REAL physical plan:
  * every recommendation arm maps to its operator, including the two
  * arms the fixture never exercises (all fixture dims broadcast), and
  * the salt detection keys off the join keys, not the recommendation.
  */
class PlanConformanceSpec extends SparkSpec {
  import spark.implicits._

  private def fact = (1L to 100L).map(i => (i, i % 7)).toDF("fk", "x")
  private def dim = (0L to 6L).map(i => (i, s"d$i")).toDF("dk", "y")

  test("broadcast_dim plans a BroadcastHashJoin") {
    assert(PlanConformance.plannedJoinKind("broadcast_dim",
      fact, "x", dim, "dk") === "broadcast_hash")
  }

  test("shuffle_hash plans a ShuffledHashJoin without salt keys") {
    assert(PlanConformance.plannedJoinKind("shuffle_hash",
      fact, "x", dim, "dk") === "shuffle_hash")
  }

  test("shuffle_salted plans a ShuffledHashJoin ON the salt key") {
    assert(PlanConformance.plannedJoinKind("shuffle_salted",
      fact, "x", dim, "dk") === "shuffle_hash_salted")
  }

  test("the salted join itself is correct (salt replication joins " +
      "every fact row exactly once)") {
    // conformance is about the OPERATOR; this pins the salted plan's
    // semantics: same row count and sum as the plain join
    val plain = fact.join(dim, col("x") === col("dk"))
    val sf = fact.withColumn("salt",
      pmod(xxhash64(col("x")), lit(8L)))
    val sd = dim.withColumn("salt",
      explode(array((0 until 8).map(s => lit(s.toLong)): _*)))
    val salted = sf.join(sd,
      col("x") === col("dk") && sf("salt") === sd("salt"))
    assert(salted.count() === plain.count())
    assert(salted.agg(sum(col("fk"))).head().getLong(0) ===
      plain.agg(sum(col("fk"))).head().getLong(0))
  }
}
