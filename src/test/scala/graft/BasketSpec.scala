package graft

import org.apache.spark.sql.functions._

import graft.operators.Basket
import graft.sources.Tables

/** Market-basket family (q381–q385): hand-checked lift on a crafted
  * basket set, and the distinct-merge contract behind the streaming
  * twins (an order's lines split across batches fold to the same
  * grain).
  */
class BasketSpec extends SparkSpec {

  test("lift is exact on a hand-checked basket set") {
    import spark.implicits._
    // orders: 1 {A,B}, 2 {A,B}, 3 {A,C}, 4 {B} — N=4,
    // supp A=3, B=3, C=1; cooc(A,B)=2 lift=8/9; cooc(A,C)=1 lift=4/3
    val ob = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"), (4L, "B"))
      .toDF("l_orderkey", "p_brand")
    val got = Basket.affinityOf(ob).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(5)))).toMap
    assert(got(("A", "B")) == ((2L, 8.0 / 9.0)), got.toString)
    assert(got(("A", "C")) == ((1L, 4.0 / 3.0)), got.toString)
    assert(!got.contains(("B", "C")))
    Caches.releaseAll(spark)
  }

  test("the (order, brand) grain distinct-merges across a line split") {
    val li = Tables.lineitem(spark, sfDir)
    def ob(df: org.apache.spark.sql.DataFrame) =
      Basket.orderBrands(spark, sfDir, df)
    val whole = ob(li).collect().map(r =>
      (r.getLong(0), r.getString(1))).toSet
    val merged = ob(li.filter(col("l_linenumber") % 2 === 0))
      .unionByName(ob(li.filter(col("l_linenumber") % 2 === 1)))
      .distinct().collect().map(r =>
        (r.getLong(0), r.getString(1))).toSet
    assert(whole == merged)
    Caches.releaseAll(spark)
  }

  test("top affinities: at most 3 per brand, rank total-ordered") {
    val rows = Basket.topAffinities(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (b, rs) =>
      assert(rs.length <= 3 &&
        rs.map(_._2).sorted.sameElements(1L to rs.length), s"$b: ${rs.toSeq}")
    }
    Caches.releaseAll(spark)
  }
}
