package graft

import org.apache.spark.sql.functions._

import graft.streaming.Occ

/** Protocol properties of the OCC ledger commits (q442–q443) beyond
  * the per-query oracles: serial equivalence of the final state, no
  * trace of the aborted writer, the rename claim actually losing a
  * race to an existing destination, and version-trail integrity.
  */
class OccSpec extends SparkSpec {

  test("occ schedule: verdicts, version trail, and serial-equivalent state") {
    val (attempts, root) = Occ.runSchedule(spark, sfDir)
    val byWriter = attempts.map(a => a.writer -> a).toMap
    assert(byWriter("a").outcome === "committed")
    assert(byWriter("a").commitVersion === 1L)
    assert(byWriter("c").outcome === "aborted")
    assert(byWriter("c").nConflictKeys === byWriter("c").nDeltaKeys)
    assert(byWriter("b").outcome === "rebased")
    assert(byWriter("b").commitVersion === 2L)

    // version trail: exactly v0..v2 committed, no strays from C
    val versions = graft.streaming.Provenance
      .committedVersions(spark, root).map(_._1)
    assert(versions === Seq(0L, 1L, 2L))

    // final state = serial A then B; C's +1000 nowhere
    val finalPath = graft.streaming.Provenance
      .committedVersions(spark, root).maxBy(_._1)._3
    val st = spark.read.parquet(finalPath)
    val base = spark.read.parquet(s"$root/b0_0")
      .withColumnRenamed("n_orders", "base_orders")
    val joined = st.join(base, Seq("c_custkey")).collect()
    joined.foreach { r =>
      val k = r.getAs[Long]("c_custkey")
      val want = r.getAs[Long]("base_orders") +
        (if (k % 3 == 0) 7L else if (k % 3 == 1) 11L else 0L)
      assert(r.getAs[Long]("n_orders") === want, s"key $k")
    }
    assert(st.count() === base.count())
    Caches.releaseAll(spark)
  }

  test("stale base from a squatted version: re-check, never clobber, land past it") {
    val (_, root) = Occ.runSchedule(spark, sfDir)
    // a fourth writer with disjoint keys (%3 == 2) reads base v2,
    // then someone else commits v3 before it attempts: the protocol
    // must NOT clobber v3, must conflict-check against its diff,
    // and land on v4
    val latest = graft.streaming.Provenance
      .committedVersions(spark, root).maxBy(_._1)
    // squat v3 with a COMMITTED copy of v2 (same content: its diff
    // vs v2 is empty, so writer d must see zero conflicts)
    spark.read.parquet(latest._3).write.parquet(s"$root/b3_0")
    val d = Occ.tryCommit(spark, root, "d", 2L,
      snap => snap.filter(col("c_custkey") % 3 === 2)
        .select(col("c_custkey")),
      snap => snap.withColumn("n_orders",
        when(col("c_custkey") % 3 === 2, col("n_orders") + 5L)
          .otherwise(col("n_orders"))))
    assert(d.outcome === "rebased") // base 2 was stale by the squat
    assert(d.commitVersion === 4L)
    // the squatted v3 is untouched, v4 carries d's increment
    val v3 = spark.read.parquet(s"$root/b3_0")
      .agg(sum(col("n_orders"))).collect()(0).getLong(0)
    val v2 = spark.read.parquet(latest._3)
      .agg(sum(col("n_orders"))).collect()(0).getLong(0)
    assert(v3 === v2)
    Caches.releaseAll(spark)
  }

  test("change sets ride inside versions, hidden from state reads") {
    val (_, root) = Occ.runSchedule(spark, sfDir)
    val versions = graft.streaming.Provenance
      .committedVersions(spark, root)
    // v1/v2 carry a _changeset dir with old/new values; state reads
    // don't see its rows
    versions.filter(_._1 > 0L).foreach { case (v, _, path) =>
      val cs = spark.read.parquet(s"$path/_changeset")
      assert(cs.columns.toSeq === Seq("c_custkey", "old_val", "new_val"))
      assert(cs.count() > 0L)
      // every stored row is a real update: new = old + the writer's
      // increment, never null on either side (updates-only fixture)
      assert(cs.filter(col("old_val").isNull || col("new_val").isNull)
        .count() === 0L)
      val state = spark.read.parquet(path)
      assert(state.columns.toSeq === Seq("c_custkey", "n_orders"))
    }
    // parity rows all green
    Occ.occChangesetParity(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Boolean]("equal"))
      assert(r.getAs[Long]("n_stored") === r.getAs[Long]("n_diffed"))
    }
    Caches.releaseAll(spark)
  }

  test("conflict check consumes _changeset metadata, not row diffs") {
    val (_, root) = Occ.runSchedule(spark, sfDir)
    val latest = graft.streaming.Provenance
      .committedVersions(spark, root).maxBy(_._1)
    // squat v3 with a content-identical copy of v2 (row diff = ∅) but
    // FORGE its change set to claim writer e's keys (%3 == 2). A
    // diff-based conflict check sees no conflict; the metadata path
    // must abort — the verdict tells us which one ran.
    val head = spark.read.parquet(latest._3)
    head.write.parquet(s"$root/b3_0")
    head.filter(col("c_custkey") % 3 === 2)
      .select(col("c_custkey"), col("n_orders").as("old_val"),
        (col("n_orders") + 1L).as("new_val"))
      .write.parquet(s"$root/b3_0/_changeset")
    val e = Occ.tryCommit(spark, root, "e", 2L,
      snap => snap.filter(col("c_custkey") % 3 === 2)
        .select(col("c_custkey")),
      snap => snap.withColumn("n_orders",
        when(col("c_custkey") % 3 === 2, col("n_orders") + 5L)
          .otherwise(col("n_orders"))))
    assert(e.outcome === "aborted")
    assert(e.nConflictKeys > 0L)
    Caches.releaseAll(spark)
  }

  test("aborted writer leaves no staging dirs or versions behind") {
    val (_, root) = Occ.runSchedule(spark, sfDir)
    import org.apache.hadoop.fs.Path
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new Path(root)).map(_.getPath.getName)
    assert(names.forall(!_.contains("staging")), names.mkString(","))
    assert(names.count(_.startsWith("b")) === 3)
    Caches.releaseAll(spark)
  }
}
