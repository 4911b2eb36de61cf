package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, LessThanOrEqual}

import graft.operators.{Optimize, ZoneMap}
import graft.sources.lake.{GraftLake, LakeBloom}

/** The DSv2 lake provider's contract: planned partitions equal the
  * zone-map audit's admitted-file count (pruning is REAL — a pruned
  * file is never planned), results through the pruned path equal the
  * full corpus, the bloom path prunes strictly harder on absent point
  * probes, and every bloom decision is sound (no admitted-and-present
  * key ever rejected).
  */
class GraftLakeSpec extends SparkSpec {

  private lazy val root = GraftLake.ensureTable(spark, sfDir)
  private lazy val lake = GraftLake.lakeDf(spark, sfDir)
  private lazy val live = Optimize.rewrittenFiles(spark, sfDir)
    .select(col("o_orderkey"), col("o_custkey"))

  test("full scan through the provider equals the OPTIMIZE output") {
    val got = lake.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = live.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // the %37 DVs are folded on disk, not masked at read
    assert(got.forall(_._1 % 37 != 0))
  }

  test("planInputPartitions matches the zone-map overlap count, and " +
      "the PHYSICAL scan plans exactly that many partitions") {
    val o = ZoneMap.orders(spark, sfDir)
    val maxCk = o.agg(max(col("o_custkey"))).collect()(0).getLong(0)
    val lo = 3L * maxCk / 8L
    val hi = lo + maxCk / 16L
    // expected = admitted files per the stored manifest semantics,
    // recomputed independently from the layout frame
    val zones = ZoneMap.zones(Optimize.rewrittenFiles(spark, sfDir))
    val expected = zones
      .filter(col("max_ck") >= lo && col("min_ck") <= hi).count()
    val total = zones.count()
    assert(expected < total, "fixture must actually prune")
    val filters = Array[Filter](
      GreaterThanOrEqual("o_custkey", lo),
      LessThanOrEqual("o_custkey", hi))
    val planned = GraftLake.plannedFiles(root, filters)
    assert(planned == expected)
    // and the SQL surface plans the PACKED splits: the BatchScan
    // under the filtered df carries exactly the bin-packed partition
    // count (≤ admitted files — one task per file does not scale)
    val expectedSplits = GraftLake.plannedSplits(root, filters)
    assert(expectedSplits <= planned)
    val df = lake.filter(col("o_custkey") >= lo && col("o_custkey") <= hi)
    df.count() // materialize (finalizes AQE)
    val scans = preparedPlan(df).collect {
      case b: BatchScanExec => b.inputRDD.getNumPartitions
    }
    assert(scans.nonEmpty)
    assert(scans.head.toLong == expectedSplits)
    // result parity with the unpruned corpus
    val viaLake = df.agg(count(lit(1)), sum(col("o_orderkey")))
      .collect()(0)
    val viaFull = live
      .filter(col("o_custkey") >= lo && col("o_custkey") <= hi)
      .agg(count(lit(1)), sum(col("o_orderkey"))).collect()(0)
    assert(viaLake.getLong(0) == viaFull.getLong(0))
    assert(viaLake.getLong(1) == viaFull.getLong(1))
  }

  test("column pruning: a single-column projection reads correctly") {
    val got = lake.select(col("o_custkey"))
      .agg(sum(col("o_custkey"))).collect()(0).getLong(0)
    val want = live.agg(sum(col("o_custkey"))).collect()(0).getLong(0)
    assert(got == want)
    assert(lake.count() == live.count())
  }

  test("bloom point probes: sound on present keys, strictly harder " +
      "than zones on a folded (absent) key") {
    // every PRESENT key must be admitted by its own file's bloom:
    // probe 20 live keys spread across the range
    val keys = live.orderBy(col("o_orderkey")).limit(2000)
      .collect().map(_.getLong(0))
    val sample = keys.indices.filter(_ % 97 == 0).map(keys(_)).take(20)
    sample.foreach { k =>
      val n = lake.filter(col("o_orderkey") === k).count()
      assert(n == 1L, s"present key $k must survive the bloom path")
    }
    // an absent key (%37-folded) inside some file's zone range:
    // zones admit >=1 file; bloom must admit a subset and the scan
    // returns zero rows
    val folded = ZoneMap.orders(spark, sfDir)
      .filter(col("o_orderkey") % 37 === 0)
      .orderBy(col("o_orderkey")).limit(50).collect()
      .map(_.getLong(0))
    var sawStrictPrune = false
    folded.foreach { k =>
      val zoned = GraftLake.plannedFiles(root, Array[Filter](
        GreaterThanOrEqual("o_orderkey", k),
        LessThanOrEqual("o_orderkey", k)))
      val bloomed = GraftLake.plannedFiles(root,
        Array[Filter](EqualTo("o_orderkey", k)))
      assert(bloomed <= zoned)
      if (bloomed < zoned) sawStrictPrune = true
      assert(lake.filter(col("o_orderkey") === k).count() == 0L)
    }
    assert(sawStrictPrune,
      "bloom must prune at least one absent probe beyond zones " +
        "(expected: ~19% bits set, fp rate < 1% per file)")
  }

  test("IN pushdown plans the union of bloom-admitted files; LIMIT " +
      "pushdown plans a row-covering prefix") {
    import org.apache.spark.sql.sources.{EqualTo, In}
    val keys = live.orderBy(col("o_orderkey")).limit(500)
      .collect().map(_.getLong(0))
    val probes = Seq(keys(10), keys(200), keys(450))
    // IN-planned files = union of the per-key EqualTo plans
    val inPlanned = GraftLake.plannedFiles(root, Array[Filter](
      In("o_orderkey", probes.map(_.asInstanceOf[Any]).toArray)))
    val perKey = probes.map(k => GraftLake.plannedFiles(root,
      Array[Filter](EqualTo("o_orderkey", k))))
    assert(inPlanned <= perKey.sum)
    assert(inPlanned >= perKey.max)
    assert(lake.filter(col("o_orderkey").isin(probes: _*)).count()
      == probes.length.toLong)
    // LIMIT: the planned prefix covers the limit and no more files
    // than needed (256-row files)
    val manifest = GraftLake.readMeta(root).files.sortBy(_.fileId)
    def expectPrefix(n: Int): Long = {
      var cum = 0L
      manifest.takeWhile { f =>
        val need = cum < n; cum += f.nRows; need
      }.length.toLong
    }
    Seq(1, 256, 257, 1000).foreach { n =>
      assert(GraftLake.plannedFilesLimited(root, n) == expectPrefix(n),
        s"limit $n")
    }
    assert(GraftLake.plannedFilesLimited(root, 1) == 1L)
    // through the SQL surface: a bare limit must NOT scan every file
    val df = lake.limit(300)
    assert(df.count() == 300L)
    Caches.releaseAll(spark)
  }

  test("the documents instance: schema-general reads (strings + " +
      "projection), id-sorted pruning, bloom on doc_id") {
    import org.apache.spark.sql.sources.EqualTo
    val docs = lakeDocs
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(docs.count() == raw.count())
    // string + long columns round-trip through the provider
    val got = docs.agg(sum(col("n_chars")),
      sum(length(col("text"))), countDistinct(col("source")))
      .collect()(0)
    val want = raw.agg(sum(col("n_chars")),
      sum(length(col("text"))), countDistinct(col("source")))
      .collect()(0)
    assert(got.getLong(0) == want.getLong(0))
    assert(got.getLong(1) == want.getLong(1))
    assert(got.getLong(2) == want.getLong(2))
    // a present doc_id point probe survives bloom; an absent id is 0
    val someId = raw.agg(max(col("doc_id"))).collect()(0).getLong(0)
    assert(docs.filter(col("doc_id") === someId).count() == 1L)
    assert(docs.filter(col("doc_id") === someId + 12345L).count() == 0L)
    // pruning on the id-sorted layout: a narrow id range plans few
    // files; the provider's plan equals the layout-derived overlap
    val docsRoot = GraftLake.ensureDocsTable(spark, sfDir)
    val meta = GraftLake.readMeta(docsRoot)
    assert(meta.schema.fieldNames.toSeq ==
      Seq("doc_id", "lang", "source", "n_chars", "text"))
    val lo = someId / 2
    val hi = lo + 100
    val planned = GraftLake.plannedFiles(docsRoot, Array[Filter](
      GreaterThanOrEqual("doc_id", lo), LessThanOrEqual("doc_id", hi)))
    val expected = meta.files
      .count(f => f.zMax(0) >= lo && f.zMin(0) <= hi).toLong
    assert(planned == expected)
    // sf0.001's corpus fits one 512-row file; pruning bites from
    // sf0.01 up (q524's oracle pins it there)
    if (meta.files.length > 1)
      assert(planned < meta.files.length, "range probe must prune")
    // bloom probe through the provider's own planner
    val bloomPlanned = GraftLake.plannedFiles(docsRoot,
      Array[Filter](EqualTo("doc_id", someId)))
    assert(bloomPlanned >= 1L)
    Caches.releaseAll(spark)
  }

  private lazy val lakeDocs = GraftLake.lakeDocsDf(spark, sfDir)

  test("versioned snapshots: a pinned v0 never sees appended rows, " +
      "an unknown version fails naming the committed range") {
    val root = GraftLake.ensureIncTable(spark, sfDir)
    val v0 = GraftLake.readMeta(root, Some(0L))
    val v1 = GraftLake.readMeta(root, Some(1L))
    // append-only: v0's files are a strict subset of v1's, untouched
    assert(v0.files.map(_.path).toSet
      .subsetOf(v1.files.map(_.path).toSet))
    assert(v1.files.length > v0.files.length)
    val e = intercept[RuntimeException](
      GraftLake.readMeta(root, Some(9L)))
    assert(e.getMessage.contains("no snapshot version 9"))
    assert(e.getMessage.contains("0, 1"))
    // the SQL surface: versionAsOf pins the snapshot end to end
    def at(v: Option[String]) = {
      val rd = spark.read
        .format(classOf[graft.sources.lake.LakeTableProvider].getName)
        .option("path", root)
      v.fold(rd)(rd.option("versionAsOf", _)).load()
    }
    val n0 = at(Some("0")).count()
    val n1 = at(Some("1")).count()
    val nl = at(None).count()
    assert(n0 == v0.files.map(_.nRows).sum)
    assert(n1 == v1.files.map(_.nRows).sum)
    // latest is the v2 DV snapshot: stored rows minus the masked set
    val v2 = GraftLake.readMeta(root, Some(2L))
    assert(nl == v2.files.map(_.liveRows).sum)
    assert(nl < n1)
    assert(n0 < n1)
    Caches.releaseAll(spark)
  }

  test("merge-on-read DVs: latest masks deleted ordinals, a pinned " +
      "pre-delete snapshot still shows them, limit counts live rows") {
    val root = GraftLake.ensureIncTable(spark, sfDir)
    def at(v: Option[String]) = {
      val rd = spark.read
        .format(classOf[graft.sources.lake.LakeTableProvider].getName)
        .option("path", root)
      v.fold(rd)(rd.option("versionAsOf", _)).load()
    }
    // latest (v2): no %37 key survives the reader's mask
    assert(at(None).filter(col("o_orderkey") % 37 === 0).count() == 0L)
    // time travel ACROSS the delete: v1 still shows them
    val v1Deleted = at(Some("1"))
      .filter(col("o_orderkey") % 37 === 0).count()
    assert(v1Deleted > 0L)
    // conservation: latest + masked = v1
    assert(at(None).count() + v1Deleted == at(Some("1")).count())
    // the masked set is EXACTLY the predicate (no over/under-mask)
    val live = at(None).collect().map(_.getLong(0)).toSet
    val all = at(Some("1")).collect().map(_.getLong(0)).toSet
    assert(live == all.filter(_ % 37 != 0))
    // a pushed limit covers by LIVE rows: k rows come back even
    // though every planned file carries a DV
    assert(at(None).limit(700).count() == 700L)
    Caches.releaseAll(spark)
  }

  test("the physical scan is COLUMNAR (vectorized decode) on a " +
      "DV-free table, row-based only when a planned file carries a DV") {
    val df = lake.filter(col("o_custkey") >= 0L)
    df.count()
    val scans = preparedPlan(df).collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    assert(scans.forall(_.supportsColumnar),
      "a DV-free lake scan must hand ColumnarBatches to the exec")
    // a DV-pinned snapshot (v2) degrades to row mode — same
    // vectorized decode, row-wise handoff masking the DV ordinals
    val root2 = GraftLake.ensureIncTable(spark, sfDir)
    val dv = spark.read
      .format(classOf[graft.sources.lake.LakeTableProvider].getName)
      .option("path", root2).option("versionAsOf", "2").load()
    dv.count()
    val dvScans = preparedPlan(dv).collect { case b: BatchScanExec => b }
    assert(dvScans.nonEmpty)
    assert(dvScans.forall(!_.supportsColumnar),
      "a DV-carrying scan has no selection vector: row mode")
    // and the v3 (OPTIMIZE, DV-free) snapshot is columnar again
    val v3 = spark.read
      .format(classOf[graft.sources.lake.LakeTableProvider].getName)
      .option("path", root2).option("versionAsOf", "3").load()
    v3.count()
    val v3Scans = preparedPlan(v3).collect { case b: BatchScanExec => b }
    assert(v3Scans.nonEmpty && v3Scans.forall(_.supportsColumnar))
    Caches.releaseAll(spark)
  }

  test("the lineitem instance: typed columns round-trip exactly " +
      "(decimal money, date, timestamp_ntz, double, int), typed " +
      "zones prune, and the scan stays columnar") {
    import org.apache.spark.sql.types._
    import graft.sources.Tables
    val root = GraftLake.ensureLineitemTable(spark, sfDir)
    val meta = GraftLake.readMeta(root)
    assert(meta.schema("l_price").dataType == DecimalType(18, 2))
    assert(meta.schema("l_shipdate").dataType == DateType)
    assert(meta.schema("l_shipts").dataType == TimestampNTZType)
    assert(meta.schema("l_discount").dataType == DoubleType)
    assert(meta.schema("l_linenumber").dataType == IntegerType)
    val df = GraftLake.lakeLineitemDf(spark, sfDir)
    val raw = Tables.lineitem(spark, sfDir)
    assert(df.count() == raw.count())
    // money EXACT: cents through the lake = floor-derived cents raw
    val gotCents = df.agg(sum((col("l_price") * 100).cast("long")))
      .collect()(0).getLong(0)
    val wantCents = raw.agg(sum(
      floor(col("l_extendedprice") * 100 + 0.5).cast("long")))
      .collect()(0).getLong(0)
    assert(gotCents == wantCents)
    // typed pushdown end-to-end: a date filter through the SQL
    // surface returns exactly the raw twin's rows, on a COLUMNAR scan
    val d0 = java.sql.Date.valueOf("1996-01-01")
    val d1 = java.sql.Date.valueOf("1996-03-31")
    val pruned = df.filter(col("l_shipdate") >= lit(d0) &&
      col("l_shipdate") <= lit(d1))
    val got = pruned.count()
    val want = raw.filter(to_date(col("l_shipdate")) >= lit(d0) &&
      to_date(col("l_shipdate")) <= lit(d1)).count()
    assert(got == want)
    val scans = preparedPlan(pruned).collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty && scans.forall(_.supportsColumnar))
    // typed zones prune: the provider's plan equals the layout
    // overlap (guard: sf0.001 may be near-single-file)
    val planned = GraftLake.plannedFiles(root, Array[Filter](
      GreaterThanOrEqual("l_shipdate", d0),
      LessThanOrEqual("l_shipdate", d1)))
    if (meta.files.length > 8)
      assert(planned < meta.files.length,
        "a one-quarter date probe must prune a ~7-year corpus")
    // decimal probe: a money band admits a subset and counts exactly
    val p0 = new java.math.BigDecimal("5000.00")
    val p1 = new java.math.BigDecimal("5500.00")
    val nBand = df.filter(col("l_price") >= lit(p0) &&
      col("l_price") <= lit(p1)).count()
    val nBandRaw = raw.filter(
      floor(col("l_extendedprice") * 100 + 0.5).between(500000, 550000))
      .count()
    assert(nBand == nBandRaw)
    Caches.releaseAll(spark)
  }

  test("partition transforms: identity/day/bucket pval and admission " +
      "semantics (sound, and exact where declared)") {
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan, LessThan}
    import org.apache.spark.sql.types._
    import graft.sources.lake.{LakeEncode, LakePartSpec}
    def encL(v: Any): Long = LakeEncode.toOrderedLong(LongType, v).get
    val day = LakePartSpec.parse("day(ts)")
    assert(day.pvalOf(TimestampNTZType, 86400000000L * 5 + 123L) == 5L)
    assert(day.pvalOf(DateType, 19732L) == 19732L)
    // day admission: a probe inside day 5 admits exactly pval 5
    def encT(v: Any): Long =
      LakeEncode.toOrderedLong(TimestampNTZType, v).get
    val t = java.time.LocalDateTime.of(1970, 1, 6, 12, 0)
    assert(day.admits(TimestampNTZType, 5L, EqualTo("ts", t), encT))
    assert(!day.admits(TimestampNTZType, 4L, EqualTo("ts", t), encT))
    assert(day.admits(TimestampNTZType, 5L, GreaterThan("ts", t), encT))
    assert(!day.admits(TimestampNTZType, 4L, GreaterThan("ts", t), encT))
    val b = LakePartSpec.parse("bucket(8,event_id)")
    assert(b.render == "bucket(8,event_id)")
    assert(b.pvalOf(LongType, 17L) == 1L)
    assert(b.admits(LongType, 1L, EqualTo("event_id", 17L), encL))
    assert(!b.admits(LongType, 2L, EqualTo("event_id", 17L), encL))
    // bucket cannot prune ranges — must stay admitted (soundness)
    assert(b.admits(LongType, 2L, GreaterThan("event_id", 17L), encL))
    val id = LakePartSpec.parse("identity(k)")
    assert(id.admits(LongType, 5L, EqualTo("k", 5L), encL))
    assert(!id.admits(LongType, 6L, LessThan("k", 5L), encL))
    assert(!id.admits(LongType, 4L, GreaterThan("k", 5L), encL))
    // filters on OTHER columns never partition-prune
    assert(b.admits(LongType, 3L, EqualTo("user_id", 17L), encL))
  }

  test("aggregate pushdown: a global COUNT/MIN/MAX is served from " +
      "the manifest (one metadata partition, zero data files), " +
      "values equal the scan-computed truth, and DV / filtered / " +
      "grouped aggregates fall back") {
    import graft.sources.lake.LakeTableProvider
    val liRoot = GraftLake.ensureLineitemTable(spark, sfDir)
    val li = spark.read.format(classOf[LakeTableProvider].getName)
      .option("path", liRoot).load()
    val agg = li.agg(count(lit(1)), min(col("l_orderkey")),
      max(col("l_price")), min(col("l_shipdate")))
    val scans = preparedPlan(agg).collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    assert(scans.forall(
      _.scan.isInstanceOf[graft.sources.lake.LakeAggScan]),
      "a clean-table global aggregate must be manifest-served")
    assert(scans.forall(_.inputRDD.getNumPartitions == 1),
      "the manifest answer is one metadata partition")
    // value parity against the ordinary (non-pushable, filtered)
    // read path — filter true blocks pushdown without changing rows
    val full = li.filter(col("l_quantity") >= -1L)
      .agg(count(lit(1)), min(col("l_orderkey")), max(col("l_price")),
        min(col("l_shipdate"))).collect()(0)
    val fullScans = preparedPlan(li.filter(col("l_quantity") >= -1L)
      .agg(count(lit(1)))).collect { case b: BatchScanExec => b }
    assert(fullScans.forall(
      !_.scan.isInstanceOf[graft.sources.lake.LakeAggScan]),
      "a filtered aggregate must NOT be manifest-served")
    val got = agg.collect()(0)
    assert(got.getLong(0) == full.getLong(0))
    assert(got.getLong(1) == full.getLong(1))
    assert(got.getDecimal(2) == full.getDecimal(2))
    assert(got.getDate(3) == full.getDate(3))
    // a DV-carrying snapshot: COUNT pushes (live = stored − DV,
    // both manifest fields), MIN must not (the DV could mask the
    // extreme row)
    val incRoot = GraftLake.ensureIncTable(spark, sfDir)
    val dv = spark.read.format(classOf[LakeTableProvider].getName)
      .option("path", incRoot).option("versionAsOf", "2").load()
    val dvCount = dv.agg(count(lit(1)))
    assert(preparedPlan(dvCount).collect { case b: BatchScanExec => b }
      .forall(_.scan.isInstanceOf[graft.sources.lake.LakeAggScan]))
    val dvMin = dv.agg(min(col("o_orderkey")))
    assert(preparedPlan(dvMin).collect { case b: BatchScanExec => b }
      .forall(!_.scan.isInstanceOf[graft.sources.lake.LakeAggScan]))
    assert(dvCount.collect()(0).getLong(0) ==
      dv.filter(col("o_orderkey") >= 0L).count())
    assert(dvMin.collect()(0).getLong(0) % 37 != 0,
      "the masked extreme must come from the live rows")
    Caches.releaseAll(spark)
  }

  test("reported statistics: the scan's estimate is the live-row sum " +
      "over admitted files (post-pruning), and it steers the " +
      "broadcast build side") {
    import graft.sources.lake.LakeTableProvider
    import org.apache.spark.sql.sources.{GreaterThanOrEqual => GE, LessThanOrEqual => LE}
    val o = ZoneMap.orders(spark, sfDir)
    val maxCk = o.agg(max(col("o_custkey"))).collect()(0).getLong(0)
    val lo = 3L * maxCk / 8L
    val hi = lo + maxCk / 64L
    val rangeF = Array[Filter](GE("o_custkey", lo), LE("o_custkey", hi))
    // the estimate is exactly the admitted files' live rows
    val zones = ZoneMap.zones(Optimize.rewrittenFiles(spark, sfDir))
    val admittedRows = zones
      .filter(col("max_ck") >= lo && col("min_ck") <= hi)
      .agg(sum(col("n_rows"))).collect()(0).getLong(0)
    assert(GraftLake.estimatedRows(root, rangeF) == admittedRows)
    assert(GraftLake.estimatedRows(root, Array.empty) ==
      live.count())
    // pruned lake side vs the lineitem fact probe: the lake side is
    // the BUILD side only because its post-pruning stats say so (an
    // unknown-size DSv2 relation could never build)
    val pruned = lake
      .filter(col("o_custkey") >= lo && col("o_custkey") <= hi)
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
    val j1 = pruned.join(li, col("o_orderkey") === col("l_orderkey"))
    assert(GraftLake.lakeBuildSide(j1) == 1L,
      "the zone-pruned lake side must be the broadcast build side")
    // a 16-row probe side is smaller than the FULL lake: the stats
    // must not over-claim the build
    import spark.implicits._
    val maxOk = o.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
    val keys = (1 to 16).map(j => j.toLong * maxOk / 17L).distinct
      .toDF("k")
    val j2 = lake.join(keys, col("o_orderkey") === col("k"))
    assert(GraftLake.lakeBuildSide(j2) == 0L,
      "a tiny probe side must win the build against the full lake")
    Caches.releaseAll(spark)
  }

  test("runtime file pruning: a selective dim's keys pushed as an IN " +
      "probe plan only zone-admitted files, result equals the plain " +
      "join, and an unbounded key set is refused") {
    import org.apache.spark.sql.sources.In
    val c = graft.sources.Tables.customer(spark, sfDir)
    val maxC = c.agg(max(col("c_custkey"))).collect()(0).getLong(0)
    val cut = 31L * maxC / 32L
    val keys = c.filter(col("c_custkey") >= cut)
      .select(col("c_custkey").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(keys.nonEmpty)
    val filters = Array[Filter](
      In("o_custkey", keys.map(_.asInstanceOf[Any])))
    val total = GraftLake.plannedFiles(root, Array.empty)
    val planned = GraftLake.plannedFiles(root, filters)
    if (total > 4)
      assert(planned < total, "the cohort probe must actually prune")
    // per-file admission recomputed from the layout frame
    val zones = ZoneMap.zones(Optimize.rewrittenFiles(spark, sfDir))
      .collect().map(r => (r.getAs[Long]("min_ck"),
        r.getAs[Long]("max_ck")))
    val expected = zones.count { case (mn, mx) =>
      keys.exists(k => k >= mn && k <= mx)
    }.toLong
    assert(planned == expected)
    // value parity with the unpruned path
    val viaPruned = GraftLake
      .runtimePrunedFact(spark, root, "o_custkey", keys)
      .agg(count(lit(1)), sum(col("o_orderkey"))).collect()(0)
    val viaFull = live.filter(col("o_custkey").isin(keys: _*))
      .agg(count(lit(1)), sum(col("o_orderkey"))).collect()(0)
    assert(viaPruned.getLong(0) == viaFull.getLong(0))
    assert(viaPruned.getLong(1) == viaFull.getLong(1))
    // the honesty guard: an unbounded dim refuses the literal path
    intercept[IllegalArgumentException] {
      GraftLake.runtimePrunedFact(spark, root, "o_custkey",
        keys, cap = 1)
    }
    Caches.releaseAll(spark)
  }

  test("bloom bitmap semantics: admits() equals the positions-subset " +
      "definition") {
    val words = new Array[Long](LakeBloom.Words)
    val present = Seq(11L, 222L, 3333L)
    present.flatMap(LakeBloom.positions).foreach { p =>
      words(p >> 6) |= 1L << (p & 63)
    }
    present.foreach(k => assert(LakeBloom.admits(words, k)))
    val absentRejected = (1L to 500L)
      .filterNot(present.contains)
      .count(k => !LakeBloom.admits(words, k))
    assert(absentRejected > 480,
      "a 9-bit bitmap must reject nearly all absent keys")
  }
}
