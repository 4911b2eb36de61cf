package graft

import org.apache.spark.sql.functions._

import graft.operators.{DatasetCard, Layout, Repetition}

/** Internal-consistency invariants for the dataset card (q422), the
  * layout advisors (q416–q418), and the repetition screens
  * (q423–q425) — the cross-fact identities a single-query oracle
  * can't see.
  */
class CardLayoutSpec extends SparkSpec {

  test("dataset card: split masses partition the corpus, bounded facts") {
    val card = DatasetCard.datasetCard(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val splits = card("n_split_train") + card("n_split_val") +
      card("n_split_test")
    assert(splits === card("n_docs"))
    assert(card("n_quality_pass") <= card("n_docs"))
    assert(card("n_exact_dup_docs") <= card("n_docs"))
    assert(card("n_pii_docs") <= card("n_docs"))
    assert(card("n_contaminated_train") <= card("n_split_train"))
    assert(card("n_tokens") > card("n_docs")) // multi-token docs
    Caches.releaseAll(spark)
  }

  test("partition plan: payload budget respected, files floored at 1") {
    Layout.partitionPlan(spark, sfDir).collect().foreach { r =>
      val files = r.getAs[Long]("n_files")
      assert(files >= 1L)
      // ceil division: at most the budget per file on average, and
      // one fewer file would overflow it
      assert(r.getAs[Long]("chars_per_file") <= 250000L)
      assert(r.getAs[Long]("n_chars") > (files - 1) * 250000L)
    }
    Caches.releaseAll(spark)
  }

  test("salt plan: every hot key fans out, advisor floors at one task") {
    val salts = Layout.saltPlan(spark, sfDir).collect()
    assert(salts.nonEmpty) // event_type is genuinely hot
    salts.foreach { r =>
      assert(r.getAs[Long]("salt") >= 2L)
      assert(r.getAs[Long]("n_rows") > 100L)
    }
    Layout.shuffleAdvisor(spark, sfDir).collect().foreach(r =>
      assert(r.getAs[Long]("n_tasks") >= 1L))
    Caches.releaseAll(spark)
  }

  test("repetition screen: rollup failure counts equal the work list") {
    val rollup = Repetition.screenRollup(spark, sfDir).collect()
    val totalFail = rollup.map(r =>
      r.getAs[Long]("n_docs") - r.getAs[Long]("n_pass")).sum
    val workList = Repetition.repetitionScreen(spark, sfDir).count()
    assert(totalFail === workList)
    // the declared band rule holds on the fixture (certifies the band)
    assert(rollup.map(_.getAs[Long]("n_fail_wordlen")).sum === 0L)
    // and the firing rules are non-vacuous
    assert(rollup.map(_.getAs[Long]("n_fail_top2")).sum > 0L)
    Caches.releaseAll(spark)
  }
}
