package graft

import graft.operators.ZoneMap

/** Invariants for zone-map skipping + Z-order (q439–q441) that the
  * per-query oracles can't see: zone maps partition the table exactly,
  * the audit never under-scans (no false skip — every matching row
  * lives in a scanned file), and Z-order actually changes the layout
  * trade (custkey pruning appears; total workload scan cost drops).
  */
class ZoneMapSpec extends SparkSpec {

  test("zone maps partition the table: counts sum, ranges disjoint in file order") {
    val zs = ZoneMap.zonemapStats(spark, sfDir).collect()
    val total = zs.map(_.getAs[Long]("n_rows")).sum
    val orders = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(total === orders)
    // linear layout: file i's orderkey range ends before file i+1's starts
    zs.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_ok") < b.getAs[Long]("min_ok"))
      case _ =>
    }
    // every file but the last is full
    zs.init.foreach(r => assert(r.getAs[Long]("n_rows") === 256L))
    Caches.releaseAll(spark)
  }

  test("linear audit: sound (scanned covers matched), custkey probes prune nothing") {
    val rows = ZoneMap.zonemapSkipAudit(spark, sfDir).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matched"))
      assert(r.getAs[Long]("files_scanned") <= r.getAs[Long]("files_total"))
      if (r.getAs[String]("pred_col") == "o_custkey")
        // insertion order is orderkey order: every file spans the whole
        // custkey domain, so zone maps admit every file
        assert(r.getAs[Long]("files_scanned") === r.getAs[Long]("files_total"))
      else
        assert(r.getAs[Long]("files_scanned") < r.getAs[Long]("files_total"))
    }
    Caches.releaseAll(spark)
  }

  test("z-order: sound on both layouts, custkey pruning appears, workload cost drops") {
    // sf0.01: the cost crossover needs file granularity (at sf0.001's
    // 6 files the curve's per-file overhead still outweighs the win)
    val rows = ZoneMap.zorderSkipAudit(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      assert(r.getAs[Long]("rows_scanned_linear") >= r.getAs[Long]("rows_matched"))
      assert(r.getAs[Long]("rows_scanned_zorder") >= r.getAs[Long]("rows_matched"))
    }
    val ck = rows.filter(_.getAs[String]("pred_id").startsWith("o_custkey"))
    // every custkey probe prunes files under z-order (linear prunes zero)
    ck.foreach { r =>
      assert(r.getAs[Long]("files_scanned_zorder") <
        r.getAs[Long]("files_scanned_linear"))
    }
    // the whole workload reads fewer rows under z-order
    val linTotal = rows.map(_.getAs[Long]("rows_scanned_linear")).sum
    val zoTotal = rows.map(_.getAs[Long]("rows_scanned_zorder")).sum
    assert(zoTotal < linTotal)
    Caches.releaseAll(spark)
  }

  test("incremental maintenance: per-batch folds reproduce the full artifact") {
    val full = ZoneMap.zonemapBatchedStats(spark, sfDir).collect()
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val inc = ZoneMap.zonemapFoldIncrementally(spark, sfDir).collect()
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(full.toSeq === inc.toSeq)
    // manifest totals reconcile with the artifact
    val manifest = ZoneMap.zonemapIncremental(spark, sfDir).collect()
    assert(manifest.length === 3)
    assert(manifest.map(_.getAs[Long]("n_files_added")).sum ===
      full.length.toLong)
    assert(manifest.last.getAs[Long]("total_files_after") ===
      full.length.toLong)
    Caches.releaseAll(spark)
  }

  test("compaction: plan covers exactly the sub-chunk files, artifact conserves rows") {
    val plan = ZoneMap.compactionPlan(spark, sfDir).collect()
    assert(plan.nonEmpty) // batch tails exist (batch size % 256 != 0)
    plan.foreach { r =>
      assert(r.getAs[Long]("n_rows") < 256L)
      // prefix-cut soft cap: target + one straddling sub-chunk file
      assert(r.getAs[Long]("group_total") < 512L + 256L)
    }
    val post = ZoneMap.compactionZonemap(spark, sfDir).collect()
    val pre = ZoneMap.zonemapBatchedStats(spark, sfDir).collect()
    // rows conserved; file count shrinks by (small files - groups)
    assert(post.map(_.getAs[Long]("n_rows")).sum ===
      pre.map(_.getAs[Long]("n_rows")).sum)
    val nGroups = plan.map(_.getAs[Long]("group_id")).distinct.length
    assert(post.length === pre.length - plan.length + nGroups)
    assert(nGroups < plan.length) // at least one real merge happened
    // merged zones bound their members
    val byGroup = plan.groupBy(_.getAs[Long]("group_id"))
    post.filter(_.getAs[Boolean]("compacted")).foreach { g =>
      val gid = g.getAs[Long]("out_file") - 1000000000L
      val members = byGroup(gid)
      assert(g.getAs[Long]("n_rows") ===
        members.map(_.getAs[Long]("n_rows")).sum)
    }
    Caches.releaseAll(spark)
  }

  test("staleness: fresh beats stale beats linear at sf0.01; stats artifact sane") {
    val a = graft.operators.ZoneMap
      .zorderStalenessAudit(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getAs[String]("layout") ->
        r.getAs[Long]("rows_scanned_total")).toMap
    assert(a("fresh_zorder") < a("stale_zorder"))
    assert(a("stale_zorder") < a("linear"))
    val stats = graft.operators.Layout.tableStats(spark, sfDir)
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    stats.values.foreach { r =>
      assert(r.getAs[Long]("n_rows") === docs)
      assert(r.getAs[Long]("ndv") <= docs)
      assert(r.getAs[Long]("n_nulls") === 0L)
    }
    assert(stats("doc_id").getAs[Long]("ndv") === docs) // key column
    assert(stats("text").getAs[Long]("avg_len_x100") >
      stats("lang").getAs[Long]("avg_len_x100"))
    Caches.releaseAll(spark)
  }

  test("advisor: recommends z-order at sf0.01, totals reconcile with the audits") {
    val adv = ZoneMap.clusterKeyAdvisor(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    assert(adv.keySet === Set("sort_orderkey", "sort_custkey", "zorder"))
    assert(adv("zorder").getAs[Boolean]("recommended"))
    assert(!adv("sort_orderkey").getAs[Boolean]("recommended"))
    // advisor's sort_orderkey/zorder totals equal the q441 audit sums
    val audit = ZoneMap.zorderSkipAudit(spark, "/root/testdata/sf0.01")
      .collect()
    assert(adv("sort_orderkey").getAs[Long]("rows_scanned_total") ===
      audit.map(_.getAs[Long]("rows_scanned_linear")).sum)
    assert(adv("zorder").getAs[Long]("rows_scanned_total") ===
      audit.map(_.getAs[Long]("rows_scanned_zorder")).sum)
    Caches.releaseAll(spark)
  }
}
