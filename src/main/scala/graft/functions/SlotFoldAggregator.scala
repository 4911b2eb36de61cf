package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row for the typed slot-fold: one event's extracted multi-value
  * tokens plus its arrival order.
  */
case class SlotFoldInput(user_id: Long, seq: Long, toks: Seq[String])

/** 10 slots + overflow, joined for output. */
case class SlotFoldResult(slots: String, overflow: String)

/** A4/X2 as a typed `Aggregator[IN, BUF, OUT]` (SURVEY.md §7.4): the
  * buffer accumulates (seq, tokens) pairs in any order — reduce/merge
  * are commutative — and `finish` restores arrival order and runs ONE
  * slot merge over the concatenated stream. This keeps the aggregation
  * shuffle-friendly (partial buffers combine map-side) while the
  * order-sensitive fold happens exactly once per key.
  */
object SlotFoldAggregator
    extends Aggregator[SlotFoldInput, List[(Long, Seq[String])], SlotFoldResult] {

  override def zero: List[(Long, Seq[String])] = Nil

  override def reduce(
      b: List[(Long, Seq[String])], a: SlotFoldInput): List[(Long, Seq[String])] =
    (a.seq, a.toks) :: b

  override def merge(
      b1: List[(Long, Seq[String])],
      b2: List[(Long, Seq[String])]): List[(Long, Seq[String])] = b1 ::: b2

  override def finish(b: List[(Long, Seq[String])]): SlotFoldResult = {
    val ordered = b.sortBy(_._1).flatMap(_._2)
    val (slots, overflow) = PhoneMerge.mergeSlots(
      Seq.fill(PhoneMerge.SlotCount)(null), null, ordered)
    SlotFoldResult(
      slots.filter(_ != null).mkString("|"),
      Option(overflow).getOrElse(""))
  }

  override def bufferEncoder: Encoder[List[(Long, Seq[String])]] =
    // product encoder (Catalyst-native array<struct>) — measurably
    // cheaper than kryo blobs for shuffle-heavy partial buffers
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Seq[String])]]()

  override def outputEncoder: Encoder[SlotFoldResult] =
    Encoders.product[SlotFoldResult]
}
