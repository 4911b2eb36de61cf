package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.PhoneMerge

/** X2 goldens hand-derived from `groupContact.js` semantics (SURVEY.md
  * §5-2) + ScalaCheck invariants (§5-3).
  */
class PhoneMergeSpec extends SparkSpec {
  import PhoneMerge.mergeSlots

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val empty = Seq.fill(10)(null.asInstanceOf[String])

  test("new phones fill empty slots left to right") {
    val (slots, note) = mergeSlots(empty, null, Seq("a", "b"))
    assert(slots.take(2) == Seq("a", "b"))
    assert(slots.drop(2).forall(_ == null))
    assert(note == null)
  }

  test("existing slots keep their positions (slot stability)") {
    val existing = Seq(null, "x", null, "y") ++ Seq.fill(6)(null.asInstanceOf[String])
    val (slots, _) = mergeSlots(existing, null, Seq("a", "x", "b"))
    assert(slots(1) == "x" && slots(3) == "y")
    assert(slots(0) == "a" && slots(2) == "b")
  }

  test("overflow goes to note_other, old extras preserved") {
    val existing = (1 to 10).map(i => s"p$i")
    val (slots, note) = mergeSlots(existing, "old1,old2", Seq("new1", "old1"))
    assert(slots == existing)
    assert(note == "new1,old1,old2" || note == "new1,old2,old1")
    // old1 was in note, stays known (not re-added); exact: new1 unplaced,
    // then note entries not in slots
    assert(note.split(",").toSet == Set("new1", "old1", "old2"))
  }

  test("empty strings and whitespace normalize to null") {
    val (slots, note) = mergeSlots(Seq("", " ", "a") ++ Seq.fill(7)(null.asInstanceOf[String]),
      "  ", Seq(" b ", "", "a"))
    assert(slots(2) == "a")
    assert(slots(0) == "b")
    assert(!slots.contains(""))
    assert(note == null)
  }

  test("duplicates within new phones collapse (first occurrence wins)") {
    val (slots, _) = mergeSlots(empty, null, Seq("a", "b", "a", "c", "b"))
    assert(slots.take(3) == Seq("a", "b", "c"))
  }

  private val phoneGen = Gen.oneOf("p1", "p2", "p3", "p4", "p5", "", " p6 ")
  private val slotsGen = Gen.listOfN(10, Gen.oneOf(phoneGen, Gen.const(null.asInstanceOf[String])))
  private val newGen = Gen.listOf(phoneGen)

  test("property: idempotence — merging same phones twice is a no-op") {
    check(Prop.forAll(slotsGen, newGen) { (ex: List[String], nw: List[String]) =>
      val (s1, n1) = mergeSlots(ex, null, nw)
      val (s2, n2) = mergeSlots(s1, n1, nw)
      s1 == s2 && n1 == n2
    })
  }

  test("property: slot stability — existing non-null slots never move") {
    check(Prop.forAll(slotsGen, newGen) { (ex: List[String], nw: List[String]) =>
      val norm = ex.map(s => Option(s).map(_.trim).filter(_.nonEmpty).orNull)
      val (slots, _) = mergeSlots(ex, null, nw)
      norm.zipWithIndex.forall { case (v, i) => v == null || slots(i) == v }
    })
  }

  test("property: no duplicates across slots + note_other") {
    // precondition: existing slots are themselves duplicate-free — slot
    // stability deliberately preserves pre-existing duplicates, so dedup
    // is only guaranteed for states the engine itself produces
    check(Prop.forAll(slotsGen, newGen) { (ex: List[String], nw: List[String]) =>
      val norm = ex.map(s => Option(s).map(_.trim).filter(_.nonEmpty).orNull)
        .filter(_ != null)
      if (norm.distinct != norm) true
      else {
        val (slots, note) = mergeSlots(ex, null, nw)
        val all = slots.filter(_ != null) ++
          Option(note).map(_.split(",").toSeq).getOrElse(Seq.empty)
        all.distinct == all
      }
    })
  }

  test("property: union completeness — every new phone lands somewhere") {
    check(Prop.forAll(slotsGen, newGen) { (ex: List[String], nw: List[String]) =>
      val (slots, note) = mergeSlots(ex, null, nw)
      val all = (slots.filter(_ != null) ++
        Option(note).map(_.split(",").toSeq).getOrElse(Seq.empty)).toSet
      nw.flatMap(s => Option(s).map(_.trim).filter(_.nonEmpty)).forall(all)
    })
  }
}
