package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}

/** Invariant tests for the hypothesis-testing / robust-stats operators
  * (e_ab_test, e_chi_square, e_robust_stats) and the CCNet-style
  * perplexity bucketing (c_perplexity_buckets).
  */
class StatsSpec extends SparkSpec {

  private val sf = TestSpark.sf0001

  test("e_ab_test: variants partition the users, rates match counts, z matches flag") {
    val r = Events.queries("e_ab_test")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    val (n0, k0) = (row.getAs[Long]("n0"), row.getAs[Long]("k0"))
    val (n1, k1) = (row.getAs[Long]("n1"), row.getAs[Long]("k1"))
    assert(n0 + n1 == users)
    assert(k0 <= n0 && k1 <= n1)
    assert(row.getAs[Double]("p0") == BigDecimal(k0.toDouble / n0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val z = row.getAs[Double]("z")
    assert(row.getAs[Boolean]("significant") == (math.abs(z) > 1.96))
  }

  test("e_chi_square: full contingency table, correct df, non-negative statistic") {
    val r = Events.queries("e_chi_square")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    val nTypes = Tables.events(spark, sf).select("event_type").distinct().count()
    val nDays = Tables.events(spark, sf)
      .select(dayofweek(col("ts"))).distinct().count()
    assert(row.getAs[Long]("n_cells") <= nTypes * nDays)
    assert(row.getAs[Long]("df") == (nDays - 1) * (nTypes - 1))
    assert(row.getAs[Double]("chi2") >= 0.0)
  }

  test("e_robust_stats: covers the stream, MAD bounded by range, outliers the minority") {
    val r = Events.queries("e_robust_stats")(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(r.map(_.getAs[Long]("n")).sum == total)
    r.foreach { row =>
      assert(row.getAs[Double]("mad") >= 0.0)
      assert(row.getAs[Long]("n_outliers") < row.getAs[Long]("n") / 2)
    }
  }

  test("c_perplexity_buckets: every scoreable doc lands in exactly one tercile") {
    val r = Curation.queries("c_perplexity_buckets")(spark, sf).collect()
    val scoreable = Tables.t(spark, sf, "documents")
      .filter(size(Text.tokens(col("text"))) >= 2).count()
    assert(r.map(_.getAs[Long]("n_docs")).sum == scoreable)
    val buckets = r.map(_.getAs[String]("bucket")).toSet
    assert(buckets.subsetOf(Set("head", "middle", "tail")))
    // terciles: global bucket sizes differ by at most ~1/3 of the corpus
    val byBucket = r.groupBy(_.getAs[String]("bucket"))
      .map { case (b, rows) => b -> rows.map(_.getAs[Long]("n_docs")).sum }
    assert(byBucket.values.max - byBucket.values.min <= scoreable / 3 + 2)
  }
}
