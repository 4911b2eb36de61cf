package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomSkipping

/** The bloom guarantee (q466) and MV parity (q467) invariants. */
class BloomSkippingSpec extends SparkSpec {

  test("bloom: no false negatives, admission bounded by file count") {
    val rows = BloomSkipping.bloomFileSkipping(spark, sfDir).collect()
    assert(rows.length === 8)
    val nFiles = spark.read.parquet(s"$sfDir/orders.parquet").count() match {
      case n => (n + 255L) / 256L
    }
    rows.foreach { r =>
      // admitted ⊇ true — a bloom may over-admit, never under
      assert(r.getAs[Long]("n_admitted") >= r.getAs[Long]("n_true"))
      assert(r.getAs[Long]("n_admitted") <= nFiles)
      assert(r.getAs[Long]("n_false_positive") ===
        r.getAs[Long]("n_admitted") - r.getAs[Long]("n_true"))
    }
    // the probes exercise real lookups: at least one present key
    assert(rows.exists(_.getAs[Long]("n_true") > 0L))
    Caches.releaseAll(spark)
  }

  test("mv rewrite: both paths agree on every source") {
    val rows = BloomSkipping.mvRewriteParity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs_mv") === r.getAs[Long]("n_docs_base"))
      assert(r.getAs[Long]("n_chars_mv") === r.getAs[Long]("n_chars_base"))
    }
    Caches.releaseAll(spark)
  }
}
