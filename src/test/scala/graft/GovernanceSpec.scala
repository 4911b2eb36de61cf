package graft

import org.apache.spark.sql.functions._

import graft.operators.Governance
import graft.streaming.ShallowClone

/** RLS/masking invariants (q472–q473) and the shallow clone's
  * non-interference guarantee (q474–q475), checked against the real
  * ledger files rather than the oracle's analytic shortcut.
  */
class GovernanceSpec extends SparkSpec {

  test("rls: admin sees everything, analysts see their grants, masks count") {
    val audit = Governance.rlsMaskAudit(spark, sfDir).collect()
      .map(r => r.getAs[String]("role") -> r).toMap
    val total = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(audit("admin").getAs[Long]("n_visible") === total)
    assert(audit("admin").getAs[Long]("n_names_masked") === 0L)
    val eu = audit("analyst_eu")
    assert(eu.getAs[Long]("n_visible") < total)
    // every row the analyst sees has the name masked
    assert(eu.getAs[Long]("n_names_masked") === eu.getAs[Long]("n_visible"))
    val na = audit("analyst_na")
    assert(na.getAs[Long]("n_balances_masked") === na.getAs[Long]("n_visible"))
    assert(na.getAs[Long]("visible_balance_cents") === 0L)
    // release row count matches the audit
    val release = Governance.maskedRelease(spark, sfDir).count()
    assert(release === eu.getAs[Long]("n_visible"))
    Caches.releaseAll(spark)
  }

  test("shallow clone: rehearsal diverges the branch, source bytes untouched") {
    val (sourceRoot, cloneRoot) = ShallowClone.rehearsal(spark, sfDir)
    // source head still contains every erased-request key
    val sourceHead = graft.streaming.Provenance
      .committedVersions(spark, sourceRoot).maxBy(_._1)._3
    val sourceErased = spark.read.parquet(sourceHead)
      .filter(col("doc_id") % 37 === 0).count()
    assert(sourceErased > 0L)
    // clone head has none
    val cloneHead = ShallowClone.headPath(spark, cloneRoot)
    assert(spark.read.parquet(cloneHead)
      .filter(col("doc_id") % 37 === 0).count() === 0L)
    // zero-copy: every non-owned ref points INTO the source root
    val refs = ShallowClone.refs(spark, cloneRoot).collect()
    refs.filter(!_.getAs[Boolean]("owned")).foreach(r =>
      assert(r.getAs[String]("path").startsWith(sourceRoot)))
    assert(refs.count(_.getAs[Boolean]("owned")) === 1)
    // the source's version listing is unchanged by the branch write
    val vs = graft.streaming.Provenance
      .committedVersions(spark, sourceRoot).map(_._1)
    assert(vs === Seq(0L, 1L, 2L))

    // generational swap: a crashed GC leaves an OLD committed
    // generation beside the new one — readers must resolve the newest
    // and never observe a missing refs table. Simulate the strand by
    // re-committing the current refs as a stale-looking lower
    // generation copy; the reader still picks the max.
    import org.apache.hadoop.fs.Path
    val fs = new Path(cloneRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = fs.listStatus(new Path(cloneRoot)).map(_.getPath.getName)
      .filter(_.startsWith("_refs_g")).sorted
    assert(gens.length === 1) // GC keeps exactly one committed gen
    val curGen = gens.last.drop(7).toLong
    // plant a stale lower generation (a crashed swap's leftover)
    spark.read.parquet(s"$cloneRoot/${gens.last}").coalesce(1)
      .write.parquet(s"$cloneRoot/_refs_g${curGen - 1}")
    val recovered = ShallowClone.refs(spark, cloneRoot).collect()
    assert(recovered.length === refs.length) // max gen wins
    // an empty clone root fails loudly instead of inventing a branch
    val err = intercept[RuntimeException] {
      ShallowClone.refs(spark, s"$cloneRoot/nonexistent")
    }
    assert(err.getMessage.contains("no committed refs generation"))
    Caches.releaseAll(spark)
  }

  test("branch merge aborts when the source moved over the branch's keys") {
    val sourceRoot = graft.streaming.Erasure
      .registryLedgerDrained(spark, sfDir)
    val cloneRoot = ShallowClone.clone(spark, sourceRoot)
    val head = spark.read
      .parquet(ShallowClone.headPath(spark, cloneRoot))
    ShallowClone.commitOwned(spark, cloneRoot,
      head.filter(col("doc_id") % 37 =!= 0))
    // the source commits a change OVERLAPPING the branch's delete set
    // after the fork (a %37 doc's n_chars bumped) — the merge must
    // abort with the overlap counted, and commit nothing
    val vs = graft.streaming.Provenance
      .committedVersions(spark, sourceRoot)
    val (v, b, path) = vs.maxBy(_._1)
    spark.read.parquet(path)
      .withColumn("n_chars",
        when(col("doc_id") % 37 === 0, col("n_chars") + 1L)
          .otherwise(col("n_chars")))
      .write.parquet(s"$sourceRoot/b${v + 1}_$b")
    val res = ShallowClone.merge(spark, sourceRoot, cloneRoot)
    assert(res.outcome === "aborted")
    assert(res.nConflicts > 0L)
    assert(graft.streaming.Provenance
      .committedVersions(spark, sourceRoot).map(_._1).max === v + 1)
    Caches.releaseAll(spark)
  }
}
