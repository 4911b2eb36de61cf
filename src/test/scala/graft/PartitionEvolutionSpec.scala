package graft

import org.apache.spark.sql.functions._

import graft.operators.PartitionEvolution

/** Invariants of partition-spec evolution (q459–q460): the manifest
  * partitions the corpus exactly, spec generations have the right
  * grains, and pruning is exact under the new spec while lang-
  * amplified (but sound) under the old.
  */
class PartitionEvolutionSpec extends SparkSpec {

  test("manifest: rows partition the corpus, grains match each spec") {
    val m = PartitionEvolution.partitionEvolutionManifest(spark, sfDir)
      .collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(m.map(_.getAs[Long]("n_rows")).sum === docs)
    // spec 0 files carry no lang partition value; spec 1 files all do
    m.foreach { r =>
      if (r.getAs[Long]("spec_id") == 0L) {
        assert(r.getAs[Long]("batch_id") <= 1L)
        assert(r.isNullAt(r.fieldIndex("part_lang")))
      } else {
        assert(r.getAs[Long]("batch_id") === 2L)
        assert(!r.isNullAt(r.fieldIndex("part_lang")))
      }
    }
    Caches.releaseAll(spark)
  }

  test("scan audit: sound everywhere, exact under spec 1, amplified under spec 0") {
    val a = PartitionEvolution.partitionEvolutionScan(spark, sfDir)
      .collect().map(r => r.getAs[Long]("batch_id") -> r).toMap
    a.values.foreach(r =>
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matched")))
    // old-spec batches over-read (every lang of the probed source)
    Seq(0L, 1L).foreach { b =>
      a.get(b).foreach(r =>
        assert(r.getAs[Long]("rows_scanned") > r.getAs[Long]("rows_matched")))
    }
    // evolved spec prunes exactly
    a.get(2L).foreach { r =>
      assert(r.getAs[Long]("rows_scanned") === r.getAs[Long]("rows_matched"))
      assert(r.getAs[Long]("files_scanned") === 1L)
    }
    Caches.releaseAll(spark)
  }
}
