// Hosted inside the org.apache.spark.sql package tree because the
// expression-author surface (ExpressionUtils) is private[sql]; this is
// the standard extension point for native Catalyst expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Column surface for Spark's own runtime-filter bloom expressions —
  * the exact pair `InjectRuntimeFilter` plants for adaptive bloom
  * pruning ([[BloomFilterAggregate]] on the build side,
  * [[BloomFilterMightContain]] on the probe side, keys pre-hashed with
  * [[XxHash64]] exactly as Spark's rule does). Exposing them as columns
  * lets an operator hold the filter across stages like a driver-side
  * model (IVF-centroid style) instead of depending on the optimizer's
  * thresholds firing.
  */
object BloomRuntime {

  /** Aggregate a key column into a serialized bloom filter (binary).
    * `expectedItems` sizes the filter the same way Spark's rule sizes
    * it from build-side row-count stats.
    */
  def bloomFilterAgg(key: Column, expectedItems: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ExpressionUtils.expression(key))), expectedItems)
        .toAggregateExpression())

  /** Row-local membership probe against a driver-held serialized bloom
    * filter. No false negatives; false positives are cleared by the
    * exact join that follows.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(
        Literal(bloom, BinaryType),
        new XxHash64(Seq(ExpressionUtils.expression(key)))))
}
