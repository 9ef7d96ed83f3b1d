package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}

/** Invariant tests for association rules (q_assoc_rules), the blocked fuzzy
  * join (q_fuzzy_join), and time-to-conversion percentiles
  * (e_conversion_lag).
  */
class BasketSpec extends SparkSpec {

  private val sf = TestSpark.sf0001

  test("q_assoc_rules: supports hold, lift matches a hand recomputation for the top pair") {
    val r = Relational.queries("q_assoc_rules")(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 15)
    assert(r.forall(_.getAs[Long]("cab") >= 2L))
    assert(r.forall(row => row.getAs[Long]("pa") < row.getAs[Long]("pb")))
    val lifts = r.map(_.getAs[Double]("lift")).toSeq
    assert(lifts == lifts.sorted.reverse)
    val top = r.head
    val li = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
    val nOrders = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey").distinct().count().toDouble
    val ca = li.filter(col("l_partkey") === top.getAs[Long]("pa")).count().toDouble
    val cb = li.filter(col("l_partkey") === top.getAs[Long]("pb")).count().toDouble
    val cab = top.getAs[Long]("cab").toDouble
    val lift = (cab / nOrders) / ((ca / nOrders) * (cb / nOrders))
    assert(math.abs(lift - top.getAs[Double]("lift")) < 1e-5)
  }

  test("q_fuzzy_join: pairs are genuinely near (dist 1-2), share the block noun, no self-pairs") {
    val r = Relational.queries("q_fuzzy_join")(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val a = row.getAs[String]("name_a"); val b = row.getAs[String]("name_b")
      assert(a < b, "symmetric dedup")
      assert(row.getAs[Int]("dist") >= 1 && row.getAs[Int]("dist") <= 2)
      assert(a.split(" ").last == b.split(" ").last, "blocking key must match")
    }
  }

  test("q_fuzzy_join: finds every ≤2-distance pair the blocking permits (no false negatives in-block)") {
    val names = Tables.t(spark, sf, "part").select("p_name").distinct()
      .collect().map(_.getString(0))
    val expected = (for {
      a <- names; b <- names
      if a < b && a.split(" ").last == b.split(" ").last
      if levenshteinRef(a, b) <= 2
    } yield (a, b)).toSet
    val got = Relational.queries("q_fuzzy_join")(spark, sf).collect()
      .map(row => (row.getAs[String]("name_a"), row.getAs[String]("name_b"))).toSet
    assert(got == expected)
  }

  test("e_conversion_lag: converted ⊆ viewers, percentiles ordered") {
    val r = Events.queries("e_conversion_lag")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("n_converted") <= row.getAs[Long]("n_viewers"))
    assert(row.getAs[Long]("n_converted") > 0)
    assert(row.getAs[Double]("p50_lag_us") <= row.getAs[Double]("p90_lag_us"))
    assert(row.getAs[Double]("p90_lag_us") <= row.getAs[Long]("max_lag_us").toDouble)
  }

  /** Textbook dynamic-programming Levenshtein, as the independent referee. */
  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }
}
