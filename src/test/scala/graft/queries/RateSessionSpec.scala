package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}

/** Invariant + equivalence tests for the sliding-rate detector
  * (e_rate_window), session-duration stats (e_session_stats), and the
  * embedding norm-QA profile (s_norm_outliers).
  */
class RateSessionSpec extends SparkSpec {

  private val sf = TestSpark.sf0001

  test("e_rate_window: Σ window counts ≡ count of ordered same-user pairs within 24h") {
    val r = Events.queries("e_rate_window")(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(r.map(_.getAs[Long]("n")).sum == total)
    // sum over events of |{earlier-or-equal same-user events within 24h}|
    // == number of ordered pairs (i, j) with 0 <= t_i - t_j <= 24h —
    // an independent self-join formulation of the same quantity
    val sumC24 = r.map(row =>
      row.getAs[Double]("avg_c24") * row.getAs[Long]("n")).sum
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
    val pairs = ev.as("a").join(ev.as("b"),
        col("a.user_id") === col("b.user_id") &&
        col("a.t") >= col("b.t") && col("a.t") - col("b.t") <= 86400000000L)
      .count()
    assert(math.abs(sumC24 - pairs.toDouble) < 0.5 * r.length,
      s"sum of c24 ($sumC24, rounded per-type) vs pair count ($pairs)")
  }

  test("e_session_stats: session count agrees with e_sessionize; percentiles ordered") {
    val stats = Events.queries("e_session_stats")(spark, sf).collect()
    assert(stats.length == 1)
    val row = stats(0)
    val fromSessionize = Events.queries("e_sessionize")(spark, sf).collect()
      .map(_.getAs[Long]("n_sessions")).sum
    assert(row.getAs[Long]("n_sessions") == fromSessionize)
    assert(row.getAs[Long]("n_singleton") <= row.getAs[Long]("n_sessions"))
    assert(row.getAs[Double]("p50_dur_us") <= row.getAs[Double]("p95_dur_us"))
    assert(row.getAs[Double]("p95_dur_us") <= row.getAs[Long]("max_dur_us").toDouble)
  }

  test("s_norm_outliers: covers every vector, bounds ordered, outliers are the tail") {
    val rows = Similarity.queries("s_norm_outliers")(spark, sf).collect()
    assert(rows.length == 1)
    val row = rows(0)
    val n = Tables.t(spark, sf, "embeddings").count()
    assert(row.getAs[Long]("n_vecs") == n)
    val (lo, hi, av) = (row.getAs[Double]("min_norm"),
      row.getAs[Double]("max_norm"), row.getAs[Double]("avg_norm"))
    assert(lo <= av && av <= hi)
    assert(row.getAs[Long]("n_outliers") < n / 10)
  }
}
