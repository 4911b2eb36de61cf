package graft

import org.apache.spark.sql.functions._

import graft.operators.Preference

/** Preference-QA invariants (q480–q481): matrix accounting, margin
  * arithmetic, and cycle-list validity against the matrix itself.
  */
class PreferenceSpec extends SparkSpec {

  test("matrix: wins partition comparisons, margins consistent, pairs canonical") {
    val m = Preference.preferenceMatrix(spark, sfDir).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
      assert(r.getAs[Long]("n_a_wins") + r.getAs[Long]("n_b_wins") ===
        r.getAs[Long]("n_compared"))
      assert(r.getAs[Long]("margin") ===
        math.abs(r.getAs[Long]("n_a_wins") - r.getAs[Long]("n_b_wins")))
    }
    Caches.releaseAll(spark)
  }

  test("cycles: every listed triangle is real in the majority relation") {
    val m = Preference.preferenceMatrix(spark, sfDir).collect()
    val beats = m.filter(r =>
        r.getAs[Long]("n_a_wins") != r.getAs[Long]("n_b_wins"))
      .map { r =>
        if (r.getAs[Long]("n_a_wins") > r.getAs[Long]("n_b_wins"))
          (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
        else (r.getAs[String]("type_b"), r.getAs[String]("type_a"))
      }.toSet
    val cycles = Preference.preferenceCycles(spark, sfDir).collect()
    cycles.foreach { c =>
      val (x, y, z) = (c.getAs[String]("x"), c.getAs[String]("y"),
        c.getAs[String]("z"))
      assert(beats((x, y)) && beats((y, z)) && beats((z, x)))
      assert(x < y && x < z)
    }
    // exhaustive cross-check: recompute all 3-cycles from the matrix
    val types = m.flatMap(r => Seq(r.getAs[String]("type_a"),
      r.getAs[String]("type_b"))).distinct.sorted
    val expect = for {
      x <- types; y <- types; z <- types
      if x < y && x < z && y != z
      if beats((x, y)) && beats((y, z)) && beats((z, x))
    } yield (x, y, z)
    assert(cycles.map(c => (c.getString(0), c.getString(1),
      c.getString(2))).toSet === expect.toSet)
    Caches.releaseAll(spark)
  }
}
