package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Join statistics planner (q409): the table a 100 TB deployment
  * reads before picking physical join strategies — per declared FK
  * edge, fact-side volume, key cardinality, worst-key multiplicity,
  * dim-side volume, an exact integer skew factor
  * (max_mult · n_keys · 1000 div n_rows ≈ 1000 · max/avg), and the
  * rule-based recommendation (broadcast the dim when it fits the
  * broadcast budget; salt the shuffle when one key dominates). The
  * q293 FK-edge declaration plus the q294 skew discipline, composed
  * into the decision table; the thresholds mirror what this library
  * already does by hand (`broadcast()` on every dim below the budget,
  * salting on skewed keys).
  *
  * 100 TB shape: one key-grain collapse per edge (map-side combined),
  * #edges rows out — statistics collection is itself a linear pass,
  * which is why real deployments keep exactly this table as an
  * artifact.
  */
object JoinPlanner {

  /** Broadcast budget in ROWS — the stand-in for
    * spark.sql.autoBroadcastJoinThreshold's byte budget (exact and
    * cross-engine; bytes are layout-dependent).
    */
  private val BroadcastRows = 100000L
  private val SkewX1000 = 16000L

  /** The declared FK edges: (name, fact, fact key, dim, dim key) —
    * shared by the stats planner (q409) and the plan-conformance
    * audit (q437).
    */
  private[operators] def fkEdges(spark: SparkSession, dir: String)
      : Seq[(String, DataFrame, String, DataFrame, String)] = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val part = Tables.part(spark, dir)
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    val ev = Tables.events(spark, dir)
    Seq(
      ("customer.c_nationkey->nation", cust, "c_nationkey", nat,
        "n_nationkey"),
      ("events.user_id->customer", ev, "user_id", cust, "c_custkey"),
      ("lineitem.l_orderkey->orders", li, "l_orderkey", ord,
        "o_orderkey"),
      ("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey"),
      ("lineitem.l_suppkey->supplier", li, "l_suppkey", supp,
        "s_suppkey"),
      ("nation.n_regionkey->region", nat, "n_regionkey", reg,
        "r_regionkey"),
      ("orders.o_custkey->customer", ord, "o_custkey", cust,
        "c_custkey"),
      ("supplier.s_nationkey->nation", supp, "s_nationkey", nat,
        "n_nationkey"))
  }

  def joinStatsPlanner(spark: SparkSession, dir: String): DataFrame = {
    def edge(name: String, fact: DataFrame, key: String,
        dim: DataFrame): DataFrame = {
      val facts = fact.groupBy(col(key).as("k"))
        .agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("fact_rows"),
          count(lit(1)).as("fact_keys"),
          max(col("cnt")).as("max_mult"))
      val dims = dim.agg(count(lit(1)).as("dim_rows"))
      facts.crossJoin(dims)
        .select(lit(name).as("relation"), col("fact_rows"),
          col("fact_keys"), col("max_mult"), col("dim_rows"),
          // divide BEFORE multiplying: max_mult·fact_keys·1000 at
          // 100 TB (fact_keys ~1e10) overflows Long; 1000·max/avg with
          // the integer avg (fact_rows div fact_keys ≥ 1 whenever keys
          // exist) keeps every intermediate ≤ 1000·max_mult. Empty
          // fact ⇒ skew 0, not a division error.
          expr("CASE WHEN fact_keys > 0 THEN (max_mult * 1000L) div " +
            "(fact_rows div fact_keys) ELSE 0L END")
            .as("skew_x1000"))
        .withColumn("recommend",
          when(col("dim_rows") <= BroadcastRows,
            "broadcast_dim")
            .when(col("skew_x1000") > SkewX1000, "shuffle_salted")
            .otherwise("shuffle_hash"))
    }
    fkEdges(spark, dir)
      .map { case (name, fact, key, dim, _) => edge(name, fact, key, dim) }
      .reduce(_.unionByName(_))
      .orderBy(col("relation"))
  }
}
