package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}

/** The EXACT referees of the three sketch entries, moved out of the bench
  * span (VERDICT r13 ask #5): through round 13 `q_kmv_setops`,
  * `q_quantile_sketch` and `e_kmv_rolling_du` each computed exact ground
  * truth NEXT TO the sketch inside the corpus query, so Bench measured
  * referee cost (the quantile entry's exact `percentile` pass alone was
  * ~2.2 s of its 3.7 s at sf0.1) instead of the production read path. The
  * sketch halves stay hash-oracled in the corpus — the estimate IS the
  * output; estimator ACCURACY vs exact is asserted here, in `sbt test`,
  * with the same tolerances the in-span columns carried.
  */
class SketchRefereeSpec extends SparkSpec {

  private val sfSmall = TestSpark.sf0001
  private val sfBig = TestSpark.sf001

  test("q_kmv_setops: non-full sketches are exact; full sketches within 3/sqrt(k)") {
    // the referee the entry carried in-span: ONE conditional-distinct pass
    // over the two segments (per-customer presence flags, then four sums)
    def exactSetops(d: String): (Long, Long, Long, Long) = {
      val o = Tables.t(spark, d, "orders").select("o_orderpriority", "o_custkey")
      val fl = o.filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy("o_custkey")
        .agg(max(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("fa"),
          max(when(col("o_orderpriority") === "5-LOW", 1L).otherwise(0L)).as("fb"))
      val r = fl.agg(sum("fa").as("xa"), sum("fb").as("xb"),
        count(lit(1)).as("xu"), sum(col("fa") * col("fb")).as("xi")).head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // sf0.001 has 150 customers total — every sketch holds < k = 256
    // members, so the KMV contract says estimate == exact for all four
    // set cardinalities (a sketch smaller than k IS its key set)
    val small = Relational.queries("q_kmv_setops")(spark, sfSmall).collect()
    assert(small.length == 1)
    val s0 = small(0)
    val (sa, sb, su, si) = exactSetops(sfSmall)
    for ((c, exact) <- Seq("a" -> sa, "b" -> sb, "union" -> su, "inter" -> si))
      assert(s0.getAs[Long](s"est_$c") == exact,
        s"non-full sketch must be exact for $c")
    // sf0.01 segments have ~1300 distinct customers — sketches are full
    // and the estimates must sit inside the 3-sigma KMV error envelope
    // (rse ~ 1/sqrt(k-2) => 3 sigma ~ 18.8% at k = 256)
    val full = Relational.queries("q_kmv_setops")(spark, sfBig).collect()
    val f0 = full(0)
    val tol = 3.0 / math.sqrt(f0.getAs[Long]("k").toDouble - 2)
    val (fa, fb, fu, fi) = exactSetops(sfBig)
    for ((c, exact) <- Seq("a" -> fa, "b" -> fb, "union" -> fu, "inter" -> fi)) {
      val est = f0.getAs[Long](s"est_$c").toDouble
      assert(math.abs(est - exact) / exact <= tol,
        s"KMV estimate for $c out of 3-sigma envelope: est=$est exact=$exact")
    }
    // set-algebra sanity on the estimates themselves
    assert(f0.getAs[Long]("est_union") >=
      math.max(f0.getAs[Long]("est_a"), f0.getAs[Long]("est_b")))
    assert(f0.getAs[Long]("est_inter") <=
      math.min(f0.getAs[Long]("est_a"), f0.getAs[Long]("est_b")))
  }

  test("q_quantile_sketch: estimates sit at the exact percentiles' CDF positions") {
    // the referee the entry carried in-span: the exact order statistics
    // from ONE array-percentile aggregate. The comparison is in RANK
    // space — |cdf(est) - cdf(exact)| within the 3-sigma uniform-sample
    // band of a k-row bottom-hash sample (+2/k discreteness slack) —
    // because value-space distance has no data-free tolerance.
    val k = 256.0
    for (d <- Seq(sfSmall, sfBig)) {
      val r = Relational.queries("q_quantile_sketch")(spark, d).collect()
      assert(r.length == 4)
      val cents = Tables.t(spark, d, "lineitem")
        .select(expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"))
        .persist()
      val n = cents.count().toDouble
      val px = cents
        .agg(expr("percentile(cents, array(0.25D, 0.5D, 0.9D, 0.99D))").as("px"))
        .head.getSeq[Double](0)
      def cdf(v: Double): Double = cents.filter(col("cents") <= v).count() / n
      for ((row, i) <- r.sortBy(_.getAs[Double]("q")).zipWithIndex) {
        val q = row.getAs[Double]("q")
        val est = row.getAs[Long]("est_cents")
        val band = 3.0 * math.sqrt(q * (1 - q) / k) + 2.0 / k
        assert(math.abs(cdf(est.toDouble) - cdf(px(i))) <= band,
          s"$d q=$q: est=$est exact=${px(i)} beyond the 3-sigma rank band")
      }
      cents.unpersist()
    }
  }

  test("e_kmv_rolling_du: every day within 3 sigma of exact; estimator engaged") {
    // the referee the entry carried in-span: the e_rolling_wau
    // contribution explode (trailing-7-day exact distinct users), plus
    // the within_tol verdict column
    val k = 64.0
    val e = Tables.events(spark, sfBig)
    val exact = e.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .select(col("user_id"),
        explode(expr("sequence(day, date_add(day, 6), interval 1 day)")).as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("exact_du"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val rows = Events.queries("e_kmv_rolling_du")(spark, sfBig).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est_du")
      val ex = exact(r.getDate(0).toString)
      assert(math.abs(est - ex) <= math.ceil(3.0 * ex / math.sqrt(k - 2.0)),
        s"day=${r.getDate(0)}: est=$est exact=$ex beyond 3 sigma")
    }
    assert(rows.exists(r => r.getAs[Long]("est_du") !=
        exact(r.getDate(0).toString)),
      "sketches never filled: the estimator path is untested at this SF")
  }
}
