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

  test("e_cms_freq: CMS only overcounts, exact counts census the stream") {
    val r = Events.queries("e_cms_freq")(spark, sf).collect()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(r.length == types)
    val total = Tables.events(spark, sf).count()
    assert(r.map(_.getAs[Long]("exact_n")).sum == total)
    r.foreach { row =>
      val over = row.getAs[Long]("overcount")
      assert(over >= 0, s"CMS must never undercount (${row})")
      assert(row.getAs[Long]("cms_est") ==
        row.getAs[Long]("exact_n") + over)
    }
  }

  test("e_forward_fill: full panel, observed hours kept verbatim, LOCF holds") {
    val rows = Events.queries("e_forward_fill")(spark, sf).collect()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    val spineLen = Events.queries("e_gap_fill")(spark, sf).count()
    assert(rows.length == types * spineLen)
    // replay LOCF per type in plain Scala and compare every filled cell
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, tr) =>
      var carry: Option[Double] = None
      tr.sortBy(_.getAs[java.sql.Timestamp]("hour_ts").getTime).foreach { row =>
        val v = Option(row.getAs[java.lang.Double]("v")).map(_.doubleValue)
        assert(row.getAs[Boolean]("was_gap") == v.isEmpty)
        if (v.isDefined) carry = v
        val filled = Option(row.getAs[java.lang.Double]("filled"))
          .map(_.doubleValue)
        assert(filled == carry, s"LOCF mismatch at $row")
      }
    }
  }

  test("t_bm25_topk: scores positive, ordered, and match a local recompute") {
    val r = Text.queries("t_bm25_topk")(spark, sf).collect()
    assert(r.length == 15)
    val scores = r.map(_.getAs[Double]("bm25"))
    assert(scores.forall(_ > 0.0))
    assert(scores.sameElements(scores.sortBy(-_)), "descending by score")
    // local recompute over the raw corpus (same tokenizer contract)
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(row => row.getAs[Long]("doc_id") ->
        row.getAs[String]("text").trim.toLowerCase
          .split("[ \\t\\n\\x0B\\f\\r]+").toSeq)
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum / n
    val terms = Seq("hash", "join", "filter")
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    def score(toks: Seq[String]): Double = terms.map { t =>
      val tf = toks.count(_ == t).toDouble
      if (tf == 0) 0.0
      else math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0) * tf * 2.2 /
        (tf + 1.2 * (0.25 + 0.75 * toks.length / avgdl))
    }.sum
    val expected = docs.map { case (id, toks) => (id, score(toks)) }
      .filter(_._2 > 0).sortBy { case (id, sc) => (-sc, id) }.take(15)
    r.zip(expected).foreach { case (row, (id, sc)) =>
      assert(row.getAs[Long]("doc_id") == id)
      assert(math.abs(row.getAs[Double]("bm25") - sc) < 1e-4)
    }
  }

  test("q_benford_qa: full digit census, both share columns sum to one") {
    val r = Relational.queries("q_benford_qa")(spark, sf).collect()
    assert(r.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    val total = Tables.t(spark, sf, "lineitem").count()
    assert(r.map(_.getAs[Long]("n")).sum == total)
    // Σ log10(1 + 1/d) telescopes to log10(10) = 1 exactly
    assert(math.abs(r.map(_.getAs[Double]("exp_share")).sum - 1.0) < 1e-5)
    assert(math.abs(r.map(_.getAs[Double]("obs_share")).sum - 1.0) < 1e-3)
  }

  test("e_trend_ols: matches an exact local OLS over the gap-filled panel") {
    val r = Events.queries("e_trend_ols")(spark, sf).collect()
    val events = Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("HOUR", col("ts")).as("h"))
      .collect().map(row => (row.getAs[String]("event_type"),
        row.getAs[java.sql.Timestamp]("h").getTime))
    val h0 = events.map(_._2).min
    val h1 = events.map(_._2).max
    val nHours = ((h1 - h0) / 3600000L + 1).toInt
    val types = events.map(_._1).distinct.sorted
    assert(r.map(_.getAs[String]("event_type")).toSeq == types.toSeq)
    val counts = events.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    r.foreach { row =>
      val ty = row.getAs[String]("event_type")
      assert(row.getAs[Long]("n_hours") == nHours)
      val ys = (0 until nHours).map(i =>
        counts.getOrElse((ty, h0 + i * 3600000L), 0L))
      val n = nHours.toLong
      val sx = (0L until n).sum
      val sxx = (0L until n).map(x => x * x).sum
      val sy = ys.sum
      val sxy = ys.zipWithIndex.map { case (y, x) => x * y }.sum
      val syy = ys.map(y => y * y).sum
      val num = (n * sxy - sx * sy).toDouble
      val denx = (n * sxx - sx * sx).toDouble
      val deny = (n * syy - sy * sy).toDouble
      def r6(v: Double) = BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row.getAs[Double]("slope") == r6(num / denx))
      assert(row.getAs[Double]("intercept") ==
        r6((sy.toDouble - num / denx * sx.toDouble) / n.toDouble))
      assert(row.getAs[Double]("r2") == r6(num * num / (denx * deny)))
    }
  }

  test("e_changepoint: matches an exact integer CUSUM search per type") {
    val r = Events.queries("e_changepoint")(spark, sf).collect()
    val events = Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("HOUR", col("ts")).as("h"))
      .collect().map(row => (row.getAs[String]("event_type"),
        row.getAs[java.sql.Timestamp]("h").getTime))
    val h0 = events.map(_._2).min
    val nHours = ((events.map(_._2).max - h0) / 3600000L + 1).toInt
    val counts = events.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    r.foreach { row =>
      val ty = row.getAs[String]("event_type")
      val ys = (0 until nHours).map(i =>
        counts.getOrElse((ty, h0 + i * 3600000L), 0L))
      val sy = ys.sum
      val n = nHours.toLong
      var cum = 0L
      // earliest argmax of |n*cum_t - t*sy| over t in [1, n-1]
      val (bestT, bestCum) = (1 to nHours - 1).map { t =>
        cum += ys(t - 1)
        (t.toLong, cum, math.abs(n * cum - t * sy))
      }.maxBy { case (t, _, peak) => (peak, -t) } match {
        case (t, c, _) => (t, c)
      }
      assert(row.getAs[Long]("cp_idx") == bestT)
      assert(row.getAs[java.sql.Timestamp]("cp_hour_ts").getTime ==
        h0 + (bestT - 1) * 3600000L)
      assert(row.getAs[Double]("pre_mean") == r6(bestCum.toDouble / bestT))
      assert(row.getAs[Double]("post_mean") ==
        r6((sy - bestCum).toDouble / (n - bestT)))
    }
  }

  test("q_cdc_apply: snapshot membership and values match a replayed log") {
    val rows = Relational.queries("q_cdc_apply")(spark, sf).collect()
    // replay the same derived changelog locally
    val log = Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderstatus").collect()
      .map { row =>
        val ok = row.getAs[Long]("o_orderkey")
        (ok % 1000, ok, if (ok % 10 == 0) "D" else "U",
          row.getAs[Double]("o_totalprice"), row.getAs[String]("o_orderstatus"))
      }
    val expected = log.groupBy(_._1).flatMap { case (k, entries) =>
      val latest = entries.maxBy(_._2)
      if (latest._3 == "D") None
      else Some(k -> (entries.length.toLong,
        BigDecimal(latest._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, latest._5))
    }
    assert(rows.length == expected.size)
    rows.foreach { row =>
      val k = row.getAs[Long]("k")
      val (nc, price, status) = expected(k)
      assert(row.getAs[Long]("n_changes") == nc)
      assert(row.getAs[Double]("price") == price)
      assert(row.getAs[String]("status") == status)
    }
  }
}
