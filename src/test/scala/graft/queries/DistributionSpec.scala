package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}

/** Invariant + recomputation tests for the distribution-position window
  * query (q_window_dist), the truncated-EWMA series smoother (e_ewma), and
  * the PMI collocation miner (t_pmi_topk).
  */
class DistributionSpec extends SparkSpec {

  private val sf = TestSpark.sf0001

  test("q_window_dist: pr/cd in [0,1], cd >= pr, every nation tops out at cd = 1") {
    val r = Relational.queries("q_window_dist")(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val pr = row.getAs[Double]("pr"); val cd = row.getAs[Double]("cd")
      assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0)
      // cume_dist counts the current row, percent_rank does not
      assert(cd >= pr)
    }
    val maxCd = r.groupBy(_.getAs[Long]("nationkey"))
      .map { case (_, rows) => rows.map(_.getAs[Double]("cd")).max }
    assert(maxCd.forall(_ == 1.0))
    // one row per supplier that has lineitems
    val nSupp = Tables.t(spark, sf, "lineitem")
      .select("l_suppkey").distinct().count()
    assert(r.length == nSupp)
  }

  test("e_ewma: matches a direct Scala recomputation of the gap-filled series") {
    val series = Events.queries("e_gap_fill")(spark, sf).collect()
      .map(r => r.getAs[java.sql.Timestamp]("hour_ts") -> r.getAs[Long]("n_err"))
    val weights = (0 until 8).map(math.pow(0.5, _))
    val expected = series.indices.drop(7).map { i =>
      val acc = (0 until 8).foldLeft(0.0) { (a, j) =>
        a + series(i - j)._2 * weights(j)
      }
      series(i)._1 -> BigDecimal(acc / 1.9921875)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = Events.queries("e_ewma")(spark, sf).collect()
      .map(r => r.getAs[java.sql.Timestamp]("hour_ts") -> r.getAs[Double]("ewma"))
      .toMap
    assert(got.size == series.length - 7)
    assert(got == expected)
  }

  test("t_pmi_topk: min support holds, order is by pmi desc, pairs split cleanly") {
    val r = Text.queries("t_pmi_topk")(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 20)
    assert(r.forall(_.getAs[Long]("c2") >= 5L))
    val pmis = r.map(_.getAs[Double]("pmi9")).toSeq
    assert(pmis == pmis.sorted.reverse)
    r.foreach { row =>
      val parts = row.getAs[String]("bigram").split(" ", -1)
      assert(parts.length == 2, s"bigram '${row.getAs[String]("bigram")}'")
    }
  }

  test("t_pmi_topk: top pair's PMI agrees with counts recomputed from the corpus") {
    val top = Text.queries("t_pmi_topk")(spark, sf).collect().head
    val Array(x, y) = top.getAs[String]("bigram").split(" ", -1)
    val docs = Tables.t(spark, sf, "documents")
      .select(Text.tokens(col("text")).as("sp"))
    val toks = docs.select(explode(col("sp")).as("tok")).cache()
    val nUni = toks.count().toDouble
    val c1x = toks.filter(col("tok") === x).count().toDouble
    val c1y = toks.filter(col("tok") === y).count().toDouble
    val nBg = docs.filter(size(col("sp")) >= 2)
      .select((size(col("sp")) - 1).cast("long").as("n")).agg(sum("n"))
      .head().getLong(0).toDouble
    val c2 = top.getAs[Long]("c2").toDouble
    val pmi = math.log((c2 / nBg) / ((c1x / nUni) * (c1y / nUni)))
    assert(math.abs(pmi - top.getAs[Double]("pmi9")) < 1e-6)
    toks.unpersist()
  }
}
