package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planner-recommendation conformance audit (q437, block 42) — closes
  * the loop q409 opened (the r14 verdict's named candidate): the join
  * planner RECOMMENDS a physical strategy per declared FK edge; this
  * audit DRIVES the engine exactly as recommended (broadcast() for
  * `broadcast_dim`, a shuffle-hash hint for `shuffle_hash`, the q59
  * salt-and-explode plan under a shuffle-hash hint for
  * `shuffle_salted`) and reads back the operator Catalyst actually
  * planned — straight from the physical plan, salting detected from
  * the join keys themselves, not from the recommendation. An engine
  * that ignored a hint, out-planned a broadcast, or lost the salt key
  * surfaces as a diverging `actual` and breaks the oracle hash.
  *
  * 100 TB relevance: this is the audit a deployment runs in CI before
  * trusting the planner table — the recommendation is only worth
  * keeping as an artifact if the engine provably executes it.
  *
  * Shape: plan-compile only per edge (no job runs to read the plan);
  * the result is #edges rows assembled driver-side.
  */
object PlanConformance {

  private val Salts = 8

  /** Build the edge's join AS RECOMMENDED and name the join operator
    * the engine planned: `broadcast_hash`, `shuffle_hash`,
    * `shuffle_hash_salted` (shuffle-hash whose keys include the salt
    * column), or `sort_merge`/`none` (conformance failures).
    */
  private[graft] def plannedJoinKind(recommend: String,
      fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String): String = {
    import org.apache.spark.sql.execution.joins._
    val joined = recommend match {
      case "broadcast_dim" =>
        fact.join(broadcast(dim), col(factKey) === col(dimKey))
      case "shuffle_salted" =>
        // the q59 skew plan: fact side salted on the hot key, dim side
        // replicated across the salt domain, equi-join on (key, salt)
        val sf = fact.withColumn("salt",
          pmod(xxhash64(col(factKey)), lit(Salts.toLong)))
        val sd = dim.withColumn("salt",
          explode(array((0 until Salts).map(s => lit(s.toLong)): _*)))
        sf.hint("shuffle_hash")
          .join(sd, col(factKey) === col(dimKey) &&
            sf("salt") === sd("salt"))
      case _ =>
        fact.hint("shuffle_hash").join(dim, col(factKey) === col(dimKey))
    }
    joined.queryExecution.sparkPlan.collectFirst {
      case _: BroadcastHashJoinExec => "broadcast_hash"
      case j: ShuffledHashJoinExec =>
        if (j.leftKeys.exists(_.references.exists(_.name == "salt")))
          "shuffle_hash_salted"
        else "shuffle_hash"
      case _: SortMergeJoinExec => "sort_merge"
    }.getOrElse("none")
  }

  private val Expected = Map(
    "broadcast_dim" -> "broadcast_hash",
    "shuffle_hash" -> "shuffle_hash",
    "shuffle_salted" -> "shuffle_hash_salted")

  def planConformance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // bounded driver artifact: one recommendation per declared edge
    val recs = JoinPlanner.joinStatsPlanner(spark, dir)
      .select(col("relation"), col("recommend")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    JoinPlanner.fkEdges(spark, dir)
      .map { case (name, fact, fk, dim, dk) =>
        val rec = recs(name)
        val actual = plannedJoinKind(rec, fact, fk, dim, dk)
        (name, rec, actual, Expected.get(rec).contains(actual))
      }
      .toDF("relation", "recommend", "actual", "agree")
      .orderBy(col("relation"))
  }
}
