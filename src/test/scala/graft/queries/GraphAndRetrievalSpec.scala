package graft.queries

import graft.{SparkSpec, TestSpark}

/** Invariant tests for the power-method PageRank (e_pagerank), the batched
  * brute-force retrieval baseline (s_batch_topk), and readability scoring
  * (t_readability).
  */
class GraphAndRetrievalSpec extends SparkSpec {

  private val sf = TestSpark.sf0001

  test("q_hierarchy_rollup: doubling resolves first-digit roots and digit-count depths") {
    val rows = Relational.queries("q_hierarchy_rollup")(spark, sf).collect()
    // plain-Scala referee: the prefix closure and its root/depth facts
    val keys = Tables.t(spark, sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val nodes = keys.flatMap { k =>
      val str = k.toString
      (1 to str.length).map(i => str.substring(0, i).toLong)
    }.distinct
    val byRoot = nodes.groupBy(_.toString.head)
    assert(rows.length == byRoot.size)
    rows.foreach { r =>
      val root = r.getAs[Long]("root")
      assert(root < 10, s"unconverged ancestor pointer: $root")
      val grp = byRoot(root.toString.head)
      assert(r.getAs[Long]("n_nodes") == grp.length)
      assert(r.getAs[Long]("max_depth") == grp.map(_.toString.length - 1).max)
    }
  }

  test("e_pagerank: one rank per event type, all positive, mass ~1 (minus dangling leak)") {
    val r = Events.queries("e_pagerank")(spark, sf).collect()
    val nTypes = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(r.length == nTypes)
    val ranks = r.map(_.getAs[Double]("pagerank"))
    assert(ranks.forall(_ > 0.0))
    // teleport floor: every node keeps at least (1-d)/N
    assert(ranks.forall(_ >= 0.15 / nTypes - 1e-9))
    val mass = ranks.sum
    assert(mass > 0.9 && mass < 1.0 + 1e-6, s"rank mass $mass")
  }

  test("e_pagerank: deterministic across runs") {
    val a = Events.queries("e_pagerank")(spark, sf).collect().map(_.toString).toSeq
    val b = Events.queries("e_pagerank")(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("s_batch_topk: 5 ranks per query, corpus-only hits, cosine non-increasing") {
    val r = Similarity.queries("s_batch_topk")(spark, sf).collect()
    assert(r.length == 8 * 5)
    assert(r.forall(_.getAs[Long]("vec_id") >= 8L))
    r.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Long]("rnk"))
      assert(byRank.map(_.getAs[Long]("rnk")).toSeq == (1L to 5L))
      val cs = byRank.map(_.getAs[Double]("cos")).toSeq
      assert(cs == cs.sorted.reverse)
    }
  }

  test("s_batch_topk: qid 0's list matches the single-query brute force on shared corpus") {
    import org.apache.spark.sql.functions._
    // s_cosine_topk scores vec_id <> 0; restrict both to the batch corpus
    // (vec_id >= 8) for an apples-to-apples rank comparison
    val single = Similarity.queries("s_cosine_topk")(spark, sf)
      .filter(col("vec_id") >= 8).collect()
      .map(_.getAs[Long]("vec_id")).take(5).toSeq
    val batch = Similarity.queries("s_batch_topk")(spark, sf)
      .filter(col("qid") === 0).orderBy("rnk").collect()
      .map(_.getAs[Long]("vec_id")).toSeq
    assert(batch == single)
  }

  test("t_readability: covers every doc, scores bounded above by the formula constant") {
    val r = Text.queries("t_readability")(spark, sf).collect()
    val nDocs = Tables.t(spark, sf, "documents").count()
    assert(r.map(_.getAs[Long]("n_docs")).sum == nDocs)
    r.foreach { row =>
      val lo = row.getAs[Double]("min_flesch")
      val hi = row.getAs[Double]("max_flesch")
      val avg = row.getAs[Double]("avg_flesch")
      assert(hi <= 206.835 && lo <= hi)
      assert(avg >= lo - 1e-9 && avg <= hi + 1e-9)
    }
  }
}
