package graft.queries

import graft.{SparkSpec, TestSpark}

/** Invariant tests for the data-mixing scheduler (c_mix_schedule) and the
  * first-touch cumulative user census (e_cumulative_users).
  */
class MixScheduleSpec extends SparkSpec {

  private val sf = TestSpark.sf0001

  test("c_mix_schedule: targets sum to 1, rates valid, achieved shares partition the kept pool") {
    val r = Curation.queries("c_mix_schedule")(spark, sf).collect()
    assert(r.nonEmpty)
    val targets = r.map(_.getAs[Double]("target_share"))
    assert(math.abs(targets.sum - 1.0) < 1e-4)
    val en = r.find(_.getAs[String]("lang") == "en").get
    assert(en.getAs[Double]("target_share") == 0.4)
    r.foreach { row =>
      val rate = row.getAs[Double]("rate6")
      assert(rate > 0.0 && rate <= 1.0)
      assert(row.getAs[Long]("n_kept") >= 0)
      assert(row.getAs[Long]("kept_tokens") <= row.getAs[Long]("avail_tokens"))
    }
    val shares = r.map(_.getAs[Double]("achieved_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-4)
    // somebody must actually downsample for the mix to mean anything
    assert(r.exists(_.getAs[Double]("rate6") < 1.0))
  }

  test("e_cumulative_users: monotone census ending at the true distinct-user count") {
    val r = Events.queries("e_cumulative_users")(spark, sf).collect()
    assert(r.nonEmpty)
    val cums = r.map(_.getAs[Long]("cum_users")).toSeq
    assert(cums == cums.sorted, "cumulative count must be nondecreasing")
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(cums.last == users)
    assert(r.map(_.getAs[Long]("n_new")).sum == users)
  }
}
