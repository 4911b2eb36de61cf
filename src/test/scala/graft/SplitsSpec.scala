package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Splits}

/** Split-hygiene family (q360–q364): the group fix actually fixes
  * (zero cross-split edges where the doc-hash rule leaks on the same
  * fixture), migration only moves near-dup members, and the cells
  * sum-merge exactly (the streaming-twin contract).
  */
class SplitsSpec extends SparkSpec {

  test("doc-hash split leaks on the fixture; the group-safe split does not") {
    val matrix = Splits.splitLeakageMatrix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val cross = matrix.filter { case (lo, hi, _) => lo != hi }
      .map(_._3).sum
    assert(cross > 0,
      s"fixture must exhibit doc-hash leakage for the fix to mean " +
        s"anything; matrix was $matrix")
    val safe = Splits.groupSafeSplit(spark, sfDir).collect()
    assert(safe.nonEmpty)
    assert(safe.forall(_.getAs[Long]("n_leak_pairs") == 0L),
      s"group-safe split must drive cross-split edges to 0: " +
        s"${safe.mkString(", ")}")
    Caches.releaseAll(spark)
  }

  test("migration moves only near-dup members; totals conserved") {
    val docs = graft.sources.Tables.documents(spark, sfDir).count()
    val mig = Splits.splitMigration(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(mig.map(_._3).sum == docs, s"migration matrix must cover " +
      s"every doc: ${mig.map(_._3).sum} vs $docs")
    val moved = mig.filter { case (f, t, _) => f != t }.map(_._3).sum
    // every moved doc is in a non-singleton component (singletons keep
    // cluster = doc_id, hence the same hash and the same split)
    val edges = Dedup.dupEdges(spark, sfDir)
      .select(explode(array(col("id_a"), col("id_b"))).as("d"))
      .distinct().count()
    assert(moved <= edges, s"moved $moved docs but only $edges docs " +
      "sit in non-singleton components")
    Caches.releaseAll(spark)
  }

  test("split cells sum-merge: two-batch merge equals the one-shot report") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val whole = Splits.massFromCells(Splits.splitCells(docs)).collect()
    val merged = Splits.massFromCells(
      Splits.splitCells(docs.filter(col("doc_id") % 2 === 0))
        .unionByName(
          Splits.splitCells(docs.filter(col("doc_id") % 2 === 1))))
      .collect()
    assert(whole.toSeq == merged.toSeq)
    Caches.releaseAll(spark)
  }
}
