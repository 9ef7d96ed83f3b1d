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
}
