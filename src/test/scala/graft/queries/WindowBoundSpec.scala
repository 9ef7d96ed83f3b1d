package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, TestSpark}

/** Pins the bound that licenses every single-partition window in the
  * corpus. A `Window.orderBy` (or global `Window.partitionBy()`) without a
  * partition key collapses its input onto ONE task, so each such site must
  * operate on a PANEL — a frame whose cardinality is set by the calendar
  * span, a literal limit, or a vocabulary, never by data volume. Each test
  * here derives the panel's cardinality from the tables themselves and
  * asserts (a) the bound and (b) volume-invariance: the panel is the SAME
  * SIZE at sf0.001 and sf0.01 (10× the data), which is exactly the claim
  * "this window does not grow at 100 TB".
  *
  * Sites covered (the complete single-partition inventory):
  *   - e_ewma (Events.scala, hour spine), e_gap_fill/e_forward_fill share it
  *   - e_cumulative_users (day spine)
  *   - e_survival_km (day-granular duration grid)
  *   - e_shapley_attrib (channel-vocabulary row_number)
  *   - e_chi_square (weekday × event-type contingency cells)
  *   - q_interval_overlap (per-day boundary deltas)
  *   - c_lang_mix (per-language aggregate)
  *   - t_zipf_slope (literal limit(100) before the rank window)
  *   - q_quantile_sketch (merged-sample rank window over a literal
  *     limit(k); the per-segment window is key-partitioned AND
  *     theta-bounded to O(k) rows — tested below)
  *   - s_hybrid_rrf (two rank windows over literal limit(50) tower cuts)
  *   - q_skyline (strict-prefix window over the literal-256-row bucket
  *     table; the data-sized sweep window is PARTITIONED BY bucket)
  */
class WindowBoundSpec extends SparkSpec {

  private val sfSmall = TestSpark.sf0001
  private val sfBig = "/root/testdata/sf0.01"

  private def events(d: String) = Tables.events(spark, d)

  /** Calendar span of the events table in hours (inclusive). */
  private def hourSpan(d: String): Long =
    events(d).agg(
      ((unix_timestamp(date_trunc("HOUR", max(col("ts")))) -
        unix_timestamp(date_trunc("HOUR", min(col("ts"))))) / 3600L + 1L)
        .cast("long").as("h"))
      .collect().head.getLong(0)

  private def daySpan(d: String): Long =
    events(d).agg((datediff(max(to_date(col("ts"))), min(to_date(col("ts")))) + 1)
      .cast("long").as("dd")).collect().head.getLong(0)

  test("e_ewma hour spine: calendar-bounded and identical across a 10x volume step") {
    val small = hourSpan(sfSmall)
    val big = hourSpan(sfBig)
    assert(small == big,
      s"hour spine must be volume-invariant (calendar span), got $small vs $big")
    assert(big <= 8784, "spine must stay within one year of hours for this corpus")
  }

  test("e_cumulative_users day spine: calendar-bounded and volume-invariant") {
    val small = daySpan(sfSmall)
    val big = daySpan(sfBig)
    assert(small == big,
      s"day spine must be volume-invariant (calendar span), got $small vs $big")
    assert(big <= 366)
  }

  test("e_survival_km duration grid: day-granular, bounded by the calendar span") {
    // the window input is the per-duration-day aggregate; durations are
    // integer days inside the observation window, so the grid cannot
    // exceed the calendar day span regardless of user/event volume
    def grid(d: String): Long = events(d).groupBy("user_id").agg(
        min(unix_micros(col("ts"))).as("t0"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("tp"),
        max(unix_micros(col("ts"))).as("tmax"))
      .select(when(col("tp").isNotNull, expr("(tp - t0) div 86400000000"))
        .otherwise(expr("(tmax - t0) div 86400000000")).as("dur_day"))
      .distinct().count()
    val span = daySpan(sfBig)
    assert(grid(sfSmall) <= span && grid(sfBig) <= span,
      "duration grid must stay within the calendar day span")
  }

  test("e_shapley_attrib channel vocab: bounded by the <=64 lattice guard, volume-invariant") {
    def vocab(d: String): Long =
      events(d).filter(col("event_type") =!= "purchase")
        .select("event_type").distinct().count()
    val small = vocab(sfSmall)
    val big = vocab(sfBig)
    assert(small == big, s"channel vocabulary must not grow with volume, got $small vs $big")
    assert(big <= 64, "the row_number window input is the channel vocab (lattice guard bound)")
  }

  test("e_chi_square contingency cells: 7 weekdays x event-type vocab, volume-invariant") {
    def cells(d: String): Long =
      events(d).select(dayofweek(col("ts")).as("dw"), col("event_type"))
        .distinct().count()
    val small = cells(sfSmall)
    val big = cells(sfBig)
    assert(big <= 7 * 64, "cells are weekday x vocab — panel-sized")
    assert(big <= small * 2,
      s"cell panel must be volume-invariant up to sparsity fill-in, got $small -> $big")
  }

  test("q_interval_overlap per-day deltas: calendar span + max transit, volume-invariant") {
    def days(d: String): Long = {
      val li = Tables.t(spark, d, "lineitem")
      li.agg((datediff(max(to_date(col("l_shipdate"))), min(to_date(col("l_shipdate")))) + 1)
        .cast("long")).collect().head.getLong(0)
    }
    val small = days(sfSmall)
    val big = days(sfBig)
    assert(small == big,
      s"shipdate calendar span must be volume-invariant, got $small vs $big")
    // window input = distinct boundary days <= span + the 32-day max transit
    assert(big + 32 <= 4000, "per-day delta panel stays in the thousands at any SF")
  }

  test("c_lang_mix achieved-share window: per-language aggregate, volume-invariant") {
    def langs(d: String): Long =
      Tables.t(spark, d, "documents").select("lang").distinct().count()
    val small = langs(sfSmall)
    val big = langs(sfBig)
    assert(small == big, s"language vocabulary must not grow with volume, got $small vs $big")
    assert(big <= 64)
  }

  test("t_zipf_slope: rank window input is hard-capped at 100 rows by the plan itself") {
    // the limit(100) precedes the row_number window, so the single
    // partition holds <= 100 rows by construction — assert the plan keeps
    // the cap (a TakeOrderedAndProject/limit below the Window) and the
    // output confirms it
    val df = SparkEntry.queries("t_zipf_slope")(spark, sfBig)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("TakeOrderedAndProject") || p.contains("GlobalLimit"),
      "the pre-window top-100 must plan as a limit, not a full sort")
    val n = df.collect().head.getLong(0)
    assert(n <= 100, s"window input must be the top-100 terms, got $n")
  }

  test("q_quantile_sketch theta filter: per-segment window input is O(k), not O(n)") {
    // the per-segment bottom-k window ranks only rows under the integer
    // hash threshold theta_seg = min(P, 4kP div n_seg) — expected 4k
    // survivors per segment REGARDLESS of volume. Assert the survivor
    // panel holds [k, 16k] at both SFs (k=256): enough to never starve
    // the sketch, bounded enough that the window never sorts the segment.
    val P = 281474976710656L
    val k = 256L
    for (d <- Seq(sfSmall, sfBig)) {
      val li = Tables.t(spark, d, "lineitem").select(
        col("l_returnflag").as("seg"),
        expr("cast(conv(substring(md5(concat_ws('_', l_orderkey, l_linenumber))" +
          ", 1, 12), 16, 10) as bigint)").as("h"))
      val segN = li.groupBy("seg").agg(count(lit(1)).as("n_seg"))
        .select(col("seg"), col("n_seg"),
          least(lit(P), expr(s"(${4L * k}L * ${P}L) div n_seg")).as("theta"))
      val surv = li.join(segN, "seg").filter(col("h") < col("theta"))
        .groupBy("seg").agg(count(lit(1)).as("survivors"))
        .collect().map(r => r.getAs[String]("seg") -> r.getAs[Long]("survivors"))
      assert(surv.nonEmpty)
      surv.foreach { case (seg, n) =>
        assert(n >= k, s"$d/$seg: theta starved the sketch ($n < $k)")
        assert(n <= 16 * k, s"$d/$seg: theta let the window input grow ($n > ${16 * k})")
      }
    }
  }

  test("e_kmv_rolling_du: per-day sketch window input is O(k)") {
    // same theta pre-filter device as q_quantile_sketch, keyed by day
    // (k=64): survivor panel must hold [k, 16k] per day at both SFs
    val P = 281474976710656L
    val k = 64L
    for (d <- Seq(sfSmall, sfBig)) {
      val dh = Tables.events(spark, d)
        .select(to_date(col("ts")).as("day"),
          expr("cast(conv(substring(md5(cast(user_id as string)), 1, 12), 16, 10) as bigint)")
            .as("h")).distinct()
      val dayN = dh.groupBy("day").agg(count(lit(1)).as("n_day"))
        .select(col("day"), col("n_day"),
          least(lit(P), expr(s"(${4L * k}L * ${P}L) div n_day")).as("theta"))
      val surv = dh.join(dayN, "day").filter(col("h") < col("theta"))
        .groupBy("day").agg(count(lit(1)).as("survivors"), max("n_day").as("n_day"))
        .collect()
      assert(surv.nonEmpty)
      surv.foreach { r =>
        val n = r.getAs[Long]("survivors")
        // a day with fewer distinct users than k legitimately yields < k
        val floor = math.min(k, r.getAs[Long]("n_day"))
        assert(n >= floor, s"$d/${r.get(0)}: theta starved the sketch ($n < $floor)")
        assert(n <= 16 * k, s"$d/${r.get(0)}: window input grew past ${16 * k} ($n)")
      }
    }
    // estimator accuracy vs the exact contribution-explode referee lives
    // in SketchRefereeSpec (moved out of the corpus entry in round 14)
  }

  test("e_moving_percentile: panel calendar-bounded, full windows only, p50 <= p95") {
    def run(d: String) = Events.queries("e_moving_percentile")(spark, d).collect()
    val rows = run(sfSmall)
    val types = Tables.events(spark, sfSmall).select("event_type").distinct().count()
    val hours = hourSpan(sfSmall)
    // one row per (type, hour) with a complete 24-row trailing frame
    assert(rows.length == types * (hours - 23))
    rows.foreach { r =>
      assert(r.getAs[Long]("p50") <= r.getAs[Long]("p95"))
      assert(r.getAs[Long]("p50") >= 0)
    }
    // volume-invariance: 10x the events, same calendar → same row count
    assert(run(sfBig).length == rows.length,
      "panel size must follow the calendar, not the event volume")
  }

  test("s_hybrid_rrf rank panels: both tower windows sit above literal limit(50) cuts") {
    // t_zipf_slope's class: a literal limit precedes each row_number
    // window, so the single partition holds <= 50 rows by construction;
    // the output's rank columns confirm the cap end-to-end
    val r = SparkEntry.queries("s_hybrid_rrf")(spark, sfBig).collect()
    r.foreach { row =>
      if (!row.isNullAt(1)) assert(row.getInt(1) <= 50)
      if (!row.isNullAt(2)) assert(row.getInt(2) <= 50)
    }
  }
}
