package graft.queries

import graft.{SparkSpec, TestSpark}

/** Invariant tests for the k-NN label eval (s_knn_classify) and the
  * seasonal-naive forecast baseline (e_forecast_baseline).
  */
class EvalSpec extends SparkSpec {

  private val sf = TestSpark.sf0001

  test("s_knn_classify: evaluates the whole held-out batch, accuracy consistent") {
    val r = Similarity.queries("s_knn_classify")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("n_queries") == 50L)
    val acc = row.getAs[Double]("accuracy")
    assert(acc >= 0.0 && acc <= 1.0)
    val expected = BigDecimal(row.getAs[Long]("n_correct").toDouble / 50.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(acc == expected)
  }

  test("e_forecast_baseline: full panel coverage per type, MAPE non-negative") {
    val r = Events.queries("e_forecast_baseline")(spark, sf).collect()
    assert(r.nonEmpty)
    val spineLen = Events.queries("e_gap_fill")(spark, sf).count()
    r.foreach { row =>
      assert(row.getAs[Long]("n_hours") == spineLen - 24,
        "every type scores every hour with a defined 24h-back prediction")
      assert(row.getAs[Double]("mape") >= 0.0)
    }
  }

  test("s_mrl_recall: overlap bounded by k and consistent with recall") {
    val r = Similarity.queries("s_mrl_recall")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    val overlap = row.getAs[Long]("n_overlap")
    assert(overlap >= 0 && overlap <= 10)
    assert(row.getAs[Double]("recall") == overlap / 10.0)
  }

  test("t_ngram_lang_id: classifies every doc, beats 1.5x chance on the weak-signal corpus") {
    val r = Text.queries("t_ngram_lang_id")(spark, sf).collect()
    val nLangs = r.length
    assert(nLangs >= 2)
    val total = r.map(_.getAs[Long]("n_docs")).sum
    val correct = r.map(_.getAs[Long]("n_correct")).sum
    val classified = r.map(_.getAs[Long]("n_classified")).sum
    // the left join grades every doc BY CONSTRUCTION (unmatched → incorrect)
    assert(total == Tables.t(spark, sf, "documents").count())
    // coverage floor: profile trigrams should still hit nearly every doc
    assert(classified >= (total * 0.9).toLong,
      s"profile coverage $classified/$total")
    // the synthetic corpus shares most vocabulary across langs — the
    // honest bar is "clearly above chance", not "production lang-ID"
    // (measured 0.42 micro at sf0.001, 0.39 at sf0.01)
    val chance = 1.0 / nLangs
    assert(correct.toDouble / total > 1.5 * chance,
      s"micro accuracy ${correct.toDouble / total} vs chance $chance")
  }

  test("c_k_anonymity: class arithmetic is self-consistent") {
    val r = Curation.queries("c_k_anonymity")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("n_docs") ==
      Tables.t(spark, sf, "documents").count())
    assert(row.getAs[Long]("n_violating") <= row.getAs[Long]("n_classes"))
    assert(row.getAs[Long]("n_suppressed") < row.getAs[Long]("n_docs"))
    // after suppression every surviving class has at least k members (or
    // nothing survives and achieved_k is 0)
    val k = row.getAs[Long]("achieved_k")
    assert(k == 0 || k >= 5)
  }
}
