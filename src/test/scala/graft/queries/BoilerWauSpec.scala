package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}

/** Invariant tests for boilerplate detection (t_boilerplate) and exact
  * rolling 7-day active users (e_rolling_wau).
  */
class BoilerWauSpec extends SparkSpec {

  private val sf = TestSpark.sf0001

  test("e_rolling_wau: WAU dominates DAU daily and matches a direct recount on the last day") {
    val r = Events.queries("e_rolling_wau")(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("wau_7d") >= row.getAs[Long]("dau"),
        s"7-day actives can never undercut 1-day actives on ${row.getAs[java.sql.Date]("day")}")
    }
    val lastDay = r.map(_.getAs[java.sql.Date]("day")).maxBy(_.getTime)
    val expected = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .filter(col("day") <= lit(lastDay) && col("day") >= date_sub(lit(lastDay), 6))
      .select("user_id").distinct().count()
    val got = r.find(_.getAs[java.sql.Date]("day") == lastDay).get.getAs[Long]("wau_7d")
    assert(got == expected)
  }

  test("t_boilerplate: covers every chunkable doc, fractions inside [0,1]") {
    val r = Text.queries("t_boilerplate")(spark, sf).collect()
    val chunkable = Tables.t(spark, sf, "documents")
      .filter(size(Text.tokens(col("text"))) >= 10).count()
    assert(r.map(_.getAs[Long]("n_docs")).sum == chunkable)
    r.foreach { row =>
      val f = row.getAs[Double]("avg_boiler_frac")
      assert(f >= 0.0 && f <= 1.0)
      assert(row.getAs[Long]("n_heavy") <= row.getAs[Long]("n_docs"))
    }
  }
}
