package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X2 `mergePhones` (`src/services/groupContact.js:12-96`) — the densest
  * logic in the reference: 10 fixed phone slots + an overflow string.
  *
  * Semantics (hand-derived from the reference, no code copied):
  *  - existing non-empty slots keep their positions (slot stability,
  *    `groupContact.js:21-32`);
  *  - new phones are normalized (trim, ""→null), deduplicated in first-
  *    occurrence order, and those not already present in any slot or in
  *    the existing overflow fill EMPTY slots left→right;
  *  - phones that don't fit, plus existing overflow entries that are not
  *    (now) in a slot, become the new comma-joined overflow (`note_other`);
  *  - every output slot is null-normalized ("" → null).
  *
  * Two implementations:
  *  1. [[mergeSlots]] — exact slot-stable merge as a pure Scala function,
  *     unit-/property-tested, exposed via [[slotMergeUdf]] for the
  *     pipeline that needs positional fidelity.
  *  2. [[mergedOrdered]] — the relational collapse: when existing slots
  *     are dense (no interior holes, which is what the reference's own
  *     writes produce — it always fills left→right), the merge is exactly
  *     an order-preserving distinct union with a 10-slot split. Pure
  *     column expressions, codegen-friendly, DuckDB-expressible for the
  *     oracle.
  */
object PhoneMerge {

  val SlotCount = 10

  private def normalize(s: String): Option[String] =
    Option(s).map(_.trim).filter(_.nonEmpty)

  /** Exact slot-stable merge. existing: 10 slots (null = empty);
    * existingNote: comma-joined overflow; newPhones: raw extracted list.
    * Returns (10 slots, overflow-or-null).
    */
  def mergeSlots(
      existing: Seq[String],
      existingNote: String,
      newPhones: Seq[String]): (Seq[String], String) = {
    val slots = existing.padTo(SlotCount, null.asInstanceOf[String])
      .take(SlotCount).map(s => normalize(s).orNull)
    val inSlots = slots.filter(_ != null)

    val noteEntries = normalize(existingNote)
      .map(_.split(",").toSeq.flatMap(normalize)).getOrElse(Seq.empty)

    // dedup new phones in first-occurrence order; drop ones already known
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    newPhones.flatMap(normalize).foreach(seen += _)
    val known = (inSlots ++ noteEntries).toSet
    val fresh = seen.toSeq.filterNot(known)

    // fill empty slots left→right
    var queue = fresh
    val merged = slots.map { s =>
      if (s != null) s
      else if (queue.nonEmpty) { val h = queue.head; queue = queue.tail; h }
      else null
    }
    val mergedSet = merged.filter(_ != null).toSet
    // overflow: unplaced fresh phones + old note entries not now in a slot
    val overflow = (queue ++ noteEntries.filterNot(mergedSet)).distinct
    (merged, if (overflow.isEmpty) null else overflow.mkString(","))
  }

  case class MergedPhones(
      tel_no: String, tel_no2: String, tel_no3: String, tel_no4: String,
      tel_no5: String, tel_no6: String, tel_no7: String, tel_no8: String,
      tel_no9: String, tel_no10: String, note_other: String)

  /** Struct-returning UDF for positional fidelity paths. Off the hot path
    * by design — the oracle-checked queries use [[mergedOrdered]].
    */
  val slotMergeUdf = udf { (existing: Seq[String], note: String, nw: Seq[String]) =>
    val (slots, overflow) =
      mergeSlots(if (existing == null) Seq.empty else existing, note,
        if (nw == null) Seq.empty else nw)
    val p = slots.padTo(SlotCount, null.asInstanceOf[String])
    MergedPhones(p(0), p(1), p(2), p(3), p(4), p(5), p(6), p(7), p(8), p(9),
      overflow)
  }

  /** Relational collapse: order-preserving distinct union of
    * (existing slots ++ existing overflow ++ new phones). Slot prefix =
    * first 10, overflow = rest. Matches [[mergeSlots]] whenever existing
    * slots are dense (the only state the reference itself produces).
    */
  def mergedOrdered(existingArr: Column, existingNote: Column, newArr: Column): Column = {
    val noteArr = filter(
      transform(split(coalesce(existingNote, lit("")), ","), x => trim(x)),
      x => x =!= "")
    val all = concat(
      filter(transform(existingArr, x => trim(x)),
        x => x.isNotNull && x =!= ""),
      noteArr,
      filter(transform(newArr, x => trim(x)), x => x.isNotNull && x =!= ""))
    TextFunctions.distinctOrdered(all)
  }

  def slotsOf(merged: Column): Column = slice(merged, 1, SlotCount)

  def overflowOf(merged: Column): Column =
    nullif(
      array_join(
        slice(merged, lit(SlotCount + 1),
          greatest(size(merged) - SlotCount, lit(0))),
        ","),
      lit(""))
}
