package graft.streaming

import org.apache.spark.sql.SparkSession

/** Build every shared artifact for a corpus in one scheduled pass —
  * the production pre-step that moves one-time build costs out of
  * query latency entirely (run with `SPARK_GRAFT_ARTIFACT_ROOT` set
  * to a durable location; every later session then reads committed
  * artifacts). Invoked by [[graft.BuildArtifacts]]; each builder is
  * its own idempotent fingerprint-checked commit, so a crashed
  * pre-build resumes where it died and a fresh corpus rebuilds only
  * what changed.
  */
object Prebuild {

  /** Build (or freshness-check) every shared artifact; returns
    * (name, rows, builtSeconds — None when the committed artifact was
    * fresh and only read) per artifact in build order.
    */
  def all(spark: SparkSession,
      dir: String): Seq[(String, Long, Option[Double])] = {
    val builds = Seq[(String, () => Long)](
      ("dup_edges",
        () => graft.operators.Dedup.dupEdges(spark, dir).count()),
      ("dup_edges_erased37",
        () => graft.operators.Dedup.dupEdgesErased(spark, dir, 37)
          .count()),
      ("dup_edges_incr_erased97",
        () => graft.operators.Dedup
          .dupEdgesErasedIncremental(spark, dir, 97).count()),
      ("census97",
        () => ErasureOrchestrator.censusArtifact(spark, dir).count()),
      ("registry_drained",
        () => spark.read.parquet(Provenance.committedVersions(spark,
          Erasure.registryLedgerShared(spark, dir)).last._3).count()),
      ("registry_erased37",
        () => Erasure.erasedRegistryLedgerShared(spark, dir)._1
          .count()),
      ("registry_erased97",
        () => Erasure.erasedRegistryLedgerShared(spark, dir, 97)._1
          .count()),
      ("events_erased",
        () => UserErasure.erasedEventsLedger(spark, dir)._1.count()),
      ("ivf_deleted37",
        () => AnnMaintenance.deletedIvfLedger(spark, dir)._1.count()),
      ("ivf_deleted97",
        () => AnnMaintenance.deletedIvfLedger(spark, dir, 97)._1
          .count()),
      ("occ_schedule",
        () => Occ.scheduleShared(spark, dir)._1.count()),
      ("occ_race",
        () => spark.read.parquet(
          s"${Occ.raceShared(spark, dir)}/_attempts").count()),
      ("lake_orders",
        () => graft.sources.lake.GraftLake
          .readMeta(graft.sources.lake.GraftLake
            .ensureTable(spark, dir)).files.size.toLong),
      ("lake_documents",
        () => graft.sources.lake.GraftLake
          .readMeta(graft.sources.lake.GraftLake
            .ensureDocsTable(spark, dir)).files.size.toLong),
      ("lake_orders_inc",
        () => graft.sources.lake.GraftLake
          .readMeta(graft.sources.lake.GraftLake
            .ensureIncTable(spark, dir)).files.size.toLong),
      ("lake_lineitem",
        () => graft.sources.lake.GraftLake
          .readMeta(graft.sources.lake.GraftLake
            .ensureLineitemTable(spark, dir)).files.size.toLong),
      ("lake_events",
        () => graft.sources.lake.GraftLake
          .readMeta(graft.sources.lake.GraftLake
            .ensureEventsTable(spark, dir)).files.size.toLong),
      ("lake_wt_orders",
        () => graft.sources.lake.GraftLake
          .readMeta(graft.sources.lake.GraftLake
            .ensureWriteTable(spark, dir)).files.size.toLong),
      ("lake_stream_events",
        () => { graft.sources.lake.GraftLake
          .ensureStreamTable(spark, dir); 1L }),
      ("lake_evo_orders",
        () => graft.sources.lake.GraftLake
          .readMeta(graft.sources.lake.GraftLake
            .ensureEvoTable(spark, dir)).files.size.toLong),
      ("lake_race_orders",
        () => graft.sources.lake.GraftLake
          .readMeta(graft.sources.lake.GraftLake
            .ensureRaceTable(spark, dir)).files.size.toLong),
      ("lake_merge_orders",
        () => graft.sources.lake.GraftLake
          .readMeta(graft.sources.lake.GraftLake
            .ensureMergeTable(spark, dir)).files.size.toLong),
      ("lake_spj_fact",
        () => graft.sources.lake.GraftLake
          .readMeta(graft.sources.lake.LakeSpj
            .ensureFactTable(spark, dir)).files.size.toLong),
      ("lake_spj_daily",
        () => graft.sources.lake.GraftLake
          .readMeta(graft.sources.lake.LakeSpj
            .ensureDailyTable(spark, dir)).files.size.toLong),
      ("lake_pwrite_events",
        () => graft.sources.lake.GraftLake
          .readMeta(graft.sources.lake.LakeSpj
            .ensurePartWriteTable(spark, dir)).files.size.toLong),
      ("lake_del_orders",
        () => graft.sources.lake.GraftLake
          .readMeta(graft.sources.lake.GraftLake
            .ensureDeleteTable(spark, dir)).files.size.toLong),
      ("lake_silver_orders",
        () => graft.sources.lake.GraftLake
          .readMeta(graft.sources.lake.LakeMedallion
            .ensureSilverTable(spark, dir)).files.size.toLong),
      ("lake_vacuum_orders",
        () => graft.sources.lake.GraftLake
          .readMeta(graft.sources.lake.LakeVacuum
            .ensureVacuumTable(spark, dir)).files.size.toLong),
      ("gated_catalog",
        () => { GatedCommit.gatedShared(spark, dir); 1L }),
      ("merged_rehearsal",
        () => { ShallowClone.mergedRehearsalShared(spark, dir); 1L }),
      ("funnel_stages",
        () => StreamingOps.streamingFunnel(spark, dir).count()),
      ("bucketed_mart",
        () => { graft.operators.Bucketed.writeBucketed(spark, dir); 2L }),
      ("transition_counts",
        () => StreamingOps.streamingTransitions(spark, dir).count()),
      ("rfm_state",
        () => StreamingOps.streamingRfm(spark, dir).count()),
      ("daily_counts",
        () => StreamingOps.streamingCusum(spark, dir).count()),
      ("user_days",
        () => StreamingOps.streamingGrowth(spark, dir).count()),
      ("kanon_cells",
        () => AnonymityState.streamingKanonLadder(spark, dir).count()),
      ("join_stats",
        () => graft.operators.JoinPlanner.edgeStatsArtifact(spark, dir)
          .count()),
      ("view_affinity_pairs",
        () => graft.operators.Basket.affinityPairsStored(spark, dir)
          .count()),
      ("view_pricing_retracted",
        () => graft.operators.Retraction.retractablePricing(spark, dir)
          .count()),
      ("view_affinity_retracted",
        () => graft.operators.Retraction
          .retractableAffinity(spark, dir).count()),
      ("prov_sourcecounts",
        () => Provenance.ledgerManifest(spark, dir).count()),
      ("prov_first_writer",
        () => Provenance.firstWriterProvenance(spark, dir).count()),
      ("prov_bound_incidence",
        () => Provenance.incidenceWithLineage(spark, dir).count()))
    graft.ArtifactLog.drain() // clear anything a caller left behind
    builds.map { case (name, run) =>
      val n = run()
      // drain per step: whatever was recorded belongs to this build
      val spent = graft.ArtifactLog.drain().map(_.sec)
      (name, n, if (spent.isEmpty) None else Some(spent.sum))
    }
  }
}
