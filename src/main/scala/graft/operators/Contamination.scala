package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Cross-split n-gram contamination (q412–q415, block 31): the
  * benchmark-decontamination operator an LLM training pipeline runs
  * before any eval is trusted — a TRAIN document that shares a
  * w-token window with any TEST document leaks the benchmark into
  * training (the Lee et al. / GPT-3 appendix-C rule, here at w = 15,
  * the window the q167/q174 screen family already uses). The
  * embedding-side decontamination (q237/q238) catches paraphrases;
  * this is the exact-substring side, and the two compose.
  *
  * Splits are the q136 deterministic md5 rule (80/10/10 on
  * "split|doc_id" — stateless, so a doc's split never depends on
  * batching), windows are the q174 md5 machinery, and the purge is
  * the same reassembly the incremental window screen ships: remove
  * every train span that appears verbatim in test, keep the rest.
  *
  * 100 TB shape: the TEST window-hash set is tiny relative to the
  * corpus (the eval set) and is the stored artifact the streaming
  * twin builds once; the train side is windowed row-locally and
  * semi-joined on 16-byte hashes — never text; per-source rollups are
  * #sources rows. The q415 twin's cells sum-merge because
  * contamination is per-doc against a FIXED test set.
  */
object Contamination {

  private val W = 15

  /** (doc_id, source, split) + token arrays, split by the q136 rule.
    * Docs with zero tokens are out (they can't be contaminated and
    * the oracle's token CTE drops them identically).
    */
  private def splitToks(docs: DataFrame): DataFrame =
    Dedup.tokenizedDocs(docs.select(col("doc_id"), col("text")))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .withColumn("split", TextOps.splitCol("doc_id"))

  /** The distinct TEST window-hash set — the decontamination
    * artifact.
    */
  private def testWindows(st: DataFrame): DataFrame =
    Dedup.windowRows(st.filter(col("split") === "test"), W)
      .select(col("wh")).distinct()

  /** Per-train-doc shared-window profile: (doc_id, starts, n_dup). */
  private def sharedWindows(st: DataFrame, testW: DataFrame): DataFrame =
    Dedup.windowRows(st.filter(col("split") === "train"), W)
      .join(testW, Seq("wh"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("starts"),
        count(lit(1)).as("n_dup"))

  /** Contamination matrix (q412): per source — train docs, docs
    * sharing ≥1 window with test, total shared-window instances, and
    * the contaminated share. The table that decides whether a source
    * is safe to train on before any purge is paid.
    */
  def contaminationMatrix(spark: SparkSession, dir: String): DataFrame = {
    val st = splitToks(Tables.documents(spark, dir)).persist()
    graft.Caches.onRelease(() =>
      try st.unpersist(false) catch { case _: Throwable => () })
    val byDoc = sharedWindows(st, testWindows(st))
    st.filter(col("split") === "train")
      .join(byDoc, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_train_docs"),
        sum(when(col("n_dup").isNotNull, 1L).otherwise(0L))
          .as("n_contaminated"),
        sum(coalesce(col("n_dup"), lit(0L))).as("n_shared_windows"))
      .select(col("source"), col("n_train_docs"), col("n_contaminated"),
        col("n_shared_windows"),
        (col("n_contaminated").cast("double") /
          col("n_train_docs").cast("double")).as("contam_share"))
      .orderBy(col("source"))
  }

  /** Contamination purge, per affected doc (q413): the q174
    * reassembly run against the TEST window set — every leaked span
    * removed, the kept text content-hashed. Only contaminated docs
    * surface (the purge work list).
    */
  def contaminationPurge(spark: SparkSession, dir: String): DataFrame = {
    val st = splitToks(Tables.documents(spark, dir)).persist()
    graft.Caches.onRelease(() =>
      try st.unpersist(false) catch { case _: Throwable => () })
    Dedup.reassembleUncovered(st.filter(col("split") === "train"),
        sharedWindows(st, testWindows(st)), W)
      .filter(col("n_dup_windows") > 0)
      .orderBy(col("doc_id"))
  }

  /** Per-batch purge cells: (source, kind) longs that SUM-merge —
    * docs, contaminated docs, tokens before, tokens after. Shared by
    * the q414 batch rollup and the q415 streaming twin.
    */
  private[graft] def purgeCellsOf(docs: DataFrame,
      testW: DataFrame): DataFrame = {
    val st = splitToks(docs)
    val rea = Dedup.reassembleUncovered(
      st.filter(col("split") === "train"), sharedWindows(st, testW), W)
    rea.join(st.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(when(col("n_dup_windows") > 0, 1L).otherwise(0L))
          .as("contam"),
        sum(col("n_tokens")).as("toks_before"),
        sum(col("n_kept_tokens")).as("toks_after"))
      .select(col("source"), expr(
        "stack(4, 'docs', docs, 'contam', contam, " +
          "'toks_before', toks_before, 'toks_after', toks_after) " +
          "as (kind, cnt)"))
  }

  /** Drain: the q414 row shape from the cells. */
  private[graft] def purgeFromCells(cells: DataFrame): DataFrame = {
    def k(kind: String) =
      sum(when(col("kind") === kind, col("cnt")).otherwise(0L))
    cells.groupBy(col("source"))
      .agg(k("docs").as("n_train_docs"),
        k("contam").as("n_contaminated"),
        k("toks_before").as("tokens_before"),
        k("toks_after").as("tokens_after"))
      .select(col("source"), col("n_train_docs"), col("n_contaminated"),
        col("tokens_before"), col("tokens_after"),
        (col("tokens_before") - col("tokens_after")).as("tokens_lost"))
      .orderBy(col("source"))
  }

  /** Purge summary (q414): per source, what decontamination costs —
    * docs touched, token mass before/after/lost. The budget row a
    * data lead signs before the corpus-wide purge runs.
    */
  def purgeSummary(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    purgeFromCells(purgeCellsOf(docs,
      testWindows(splitToks(docs))))
  }

  /** Materialize the TEST window-hash set (the q415 twin's stored
    * artifact — built once, read per micro-batch; the test set is
    * fixed while train streams).
    */
  private[graft] def buildTestWindowTable(spark: SparkSession,
      dir: String, path: String): Unit =
    testWindows(splitToks(Tables.documents(spark, dir)))
      .write.mode("overwrite").parquet(path)
}
