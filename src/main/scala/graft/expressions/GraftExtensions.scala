// Same package-tree hosting rationale as VectorExpressions.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Engine extension wiring: exposes the native expressions to the SQL
  * text surface. Two registration paths:
  *
  *  - build-time: `SparkSession.builder().withExtensions(new
  *    GraftExtensions)` (or `spark.sql.extensions=...GraftExtensions`);
  *  - runtime: [[GraftFunctions.register]] on an existing session (used
  *    by tests and the driver-owned sessions, which we don't construct).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.dotProductDescriptor)
    e.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}

object GraftFunctions {

  private[graft] val dotProductDescriptor = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getCanonicalName, "dot_product"),
    (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      DotProduct(exprs(0), exprs(1)))

  /** Runtime registration on an existing session: the SQL function plus
    * the HOF-dot-product rewrite rule (idempotent).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    val existing = spark.experimental.extraOptimizations
    if (!existing.contains(RewriteHofDotProduct))
      spark.experimental.extraOptimizations = existing :+ RewriteHofDotProduct
  }
}
