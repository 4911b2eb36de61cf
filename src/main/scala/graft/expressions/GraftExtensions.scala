// Same package-tree hosting rationale as VectorExpressions.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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
    GraftFunctions.descriptors.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}

object GraftFunctions {

  // kernel knobs (perms/k/w) arrive from SQL text as foldable literals
  private def intArg(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] =
    Seq(
      "dot_product" -> (exprs => DotProduct(exprs(0), exprs(1))),
      "shingle_hashes" -> (exprs =>
        ShingleHashes(exprs(0), intArg(exprs(1)))),
      "minhash_signature" -> (exprs =>
        MinHashSignature(exprs(0), intArg(exprs(1)))),
      "simhash64" -> (exprs => SimHash64(exprs(0))),
      "winnow_hashes" -> (exprs =>
        WinnowHashes(exprs(0), intArg(exprs(1)), intArg(exprs(2)))))

  private[graft] val descriptors = builders.map { case (name, builder) =>
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, name),
      builder)
  }

  /** Runtime registration on an existing session: the SQL functions plus
    * the HOF-dot-product rewrite rule (idempotent).
    */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
    val existing = spark.experimental.extraOptimizations
    if (!existing.contains(RewriteHofDotProduct))
      spark.experimental.extraOptimizations = existing :+ RewriteHofDotProduct
  }
}
