package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}

/** Behavioral + plan guards for the round-13 blocked sorted-neighborhood
  * near-dup pass, the crawl snapshot diff, and the per-domain frequency cap
  * (all three also DuckDB-oracle-checked in the corpus).
  */
class SnmDiffSpec extends SparkSpec {

  private val sf = TestSpark.sf0001

  test("d_sorted_neighborhood: planted exact-dup pairs all surface at jaccard 1.0") {
    val found = Dedup.queries("d_sorted_neighborhood")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("jaccard")).toMap
    // corpusWithDups plants (2k, 2k+1) for every base doc_id k % 5 == 0 —
    // identical text → identical block key and sort position → the pair is
    // within lead distance 1 of itself, so SNM must find it exactly
    val planted = Tables.t(spark, sf, "documents")
      .filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") * 2).as("a"), (col("doc_id") * 2 + 1).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(planted.nonEmpty)
    planted.foreach { p =>
      assert(found.get(p).contains(1.0),
        s"planted exact-dup pair $p missing or below jaccard 1.0")
    }
  }

  test("d_sorted_neighborhood: window is block-partitioned; candidates bounded by N*w") {
    val df = Dedup.queries("d_sorted_neighborhood")(spark, sf)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("Window"))
    assert(!p.contains("SinglePartition"),
      "SNM's neighbor window must shuffle on the block key, never collapse " +
        "to one partition (the global-sort formulation does not scale)")
    // the whole point of SNM: the verified candidate space is N*w, not N^2
    val n = Dedup.corpusWithDups(spark, sf).count()
    assert(df.count() <= 3 * n)
  }

  test("d_mutual_best_match: a matching (each id at most once), reciprocal by construction") {
    val pairs = Dedup.queries("d_sorted_neighborhood")(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jaccard")))
    val mutual = Dedup.queries("d_mutual_best_match")(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jaccard")))
    assert(mutual.nonEmpty)
    // subset of the candidate listing
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    mutual.foreach(m => assert(pairSet.contains((m._1, m._2))))
    // MATCHING property — the whole point vs a plain argmax: no id is in
    // two surviving pairs (a hub cannot absorb a block)
    val ids = mutual.flatMap(m => Seq(m._1, m._2))
    assert(ids.length == ids.distinct.length, "an id appears in two mutual pairs")
    // reciprocity recomputed locally from the full listing
    val best = pairs.flatMap(p => Seq((p._1, (p._3, p._2)), (p._2, (p._3, p._1))))
      .groupBy(_._1)
      .map { case (src, xs) =>
        src -> xs.map(_._2).maxBy { case (j, dst) => (j, -dst) } }
    mutual.foreach { case (a, b, j) =>
      assert(best(a)._2 == b && best(b)._2 == a, s"pair ($a,$b) is not reciprocal")
      assert(best(a)._1 == j)
    }
  }

  test("d_snapshot_diff: class census matches the planted %7 strata exactly") {
    val byStatus = Dedup.queries("d_snapshot_diff")(spark, sf)
      .collect().map(r => r.getAs[String]("status") -> r.getAs[Long]("n_docs"))
      .toMap
    val strata = Tables.t(spark, sf, "documents")
      .groupBy((col("doc_id") % 7).as("m")).count()
      .collect().map(r => r.getAs[Long]("m") -> r.getAs[Long]("count")).toMap
    val total = strata.values.sum
    assert(byStatus("added") == strata(1L))
    assert(byStatus("removed") == strata(2L))
    assert(byStatus("changed") == strata(3L))
    assert(byStatus("unchanged") ==
      total - strata(1L) - strata(2L) - strata(3L))
  }

  test("c_source_cap: ledger is internally consistent and the cut is the 15th-best") {
    val rows = Curation.queries("c_source_cap")(spark, sf).collect()
    assert(rows.length == 10)
    val docs = Tables.t(spark, sf, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (src, xs) =>
        src -> xs.map(_._2).sorted(Ordering[Long].reverse) }
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val all = docs(src)
      assert(r.getAs[Long]("n_docs") == all.length)
      val kept = math.min(15, all.length)
      assert(r.getAs[Long]("n_kept") == kept)
      assert(r.getAs[Long]("n_dropped") == all.length - kept)
      // ties on n_chars break by doc_id, but the kept VALUE multiset is
      // order-independent: the worst kept quality is the kept-th largest
      assert(r.getAs[Long]("min_kept_chars") == all(kept - 1))
    }
  }
}
