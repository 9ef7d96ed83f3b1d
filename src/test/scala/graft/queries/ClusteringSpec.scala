package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}

/** Unit + invariant tests for the iterative operators: connected components
  * (min-label propagation) and k-means (Lloyd) clustering.
  */
class ClusteringSpec extends SparkSpec {

  private val sf = TestSpark.sf0001

  test("connectedComponents: path, pair, cycle and isolated node resolve to min-id roots") {
    import spark.implicits._
    // components: {1,2,3} (path), {4,5} (pair), {6} (isolated), {7,8,9} (cycle)
    val nodes = (1L to 9L).toDF("v")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (7L, 8L), (8L, 9L), (9L, 7L))
      .toDF("src", "dst")
    val cc = Dedup.connectedComponents(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("connectedComponents: long chain converges (diameter-bound iterations)") {
    import spark.implicits._
    val n = 30L
    val nodes = (1L to n).toDF("v")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val cc = Dedup.connectedComponents(nodes, edges).collect()
    assert(cc.forall(_.getLong(1) == 1L))
  }

  test("connectedComponentsFromEdges: endpoint-derived node set matches the explicit one") {
    import spark.implicits._
    // path + pair + cycle (no isolated node — the edge-derived contract)
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (7L, 8L), (8L, 9L), (9L, 7L))
      .toDF("src", "dst").localCheckpoint()
    val cc = Dedup.connectedComponentsFromEdges(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 4L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
    // long chain through the same entry point (pointer-doubling path)
    val chain = (1L until 30L).map(i => (i, i + 1)).toDF("src", "dst")
      .localCheckpoint()
    assert(Dedup.connectedComponentsFromEdges(chain).collect()
      .forall(_.getLong(1) == 1L))
  }

  test("d_dup_clusters: sizes partition the bounded doc set") {
    val r = Dedup.queries("d_dup_clusters")(spark, sf).collect()
    val docs = Tables.t(spark, sf, "documents")
      .filter(col("doc_id") < 60).count()
    val covered = r.map(row =>
      row.getAs[Long]("cluster_size") * row.getAs[Long]("n_clusters")).sum
    assert(covered == docs)
    assert(r.exists(_.getAs[Long]("cluster_size") > 1), "expect at least one real cluster")
  }

  test("s_kmeans: deterministic, clusters cover every vector, k bounded") {
    val a = Similarity.queries("s_kmeans")(spark, sf).collect()
    val b = Similarity.queries("s_kmeans")(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val total = Tables.t(spark, sf, "embeddings").count()
    assert(a.map(_.getAs[Long]("n_members")).sum == total)
    assert(a.length <= 8 && a.nonEmpty)
    assert(a.forall(_.getAs[Double]("centroid_norm") > 0.0))
  }

  test("s_semdedup: hierarchical census covers every vector, keep/drop arithmetic closes") {
    val sd = Similarity.queries("s_semdedup")(spark, sf).collect()
    // two-level assignment (vector → argmax super-cluster → argmax centroid
    // within it) still PARTITIONS the corpus: every vector lands in exactly
    // one cluster, and clusters are identified by seed ids (the k smallest
    // vec_ids). Exact per-cluster values are pinned by the DuckDB oracle,
    // which replays the identical hierarchy; this spec pins the partition
    // contract and the keep/drop arithmetic. (Pre-round-13 this asserted
    // census equality with s_kmeans's FLAT argmax — no longer expected: the
    // hierarchy can legally route a vector whose nearest centroid lives
    // outside its argmax super, the standard IVF/SemDeDup approximation.)
    val total = Tables.t(spark, sf, "embeddings").count()
    assert(sd.map(_.getAs[Long]("n_members")).sum == total)
    val k = math.max(8L, (total + 249L) / 250L)
    assert(sd.length <= k && sd.nonEmpty)
    val seedIds = Tables.t(spark, sf, "embeddings")
      .orderBy("vec_id").limit(k.toInt)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(sd.forall(r => seedIds.contains(r.getAs[Long]("cl"))),
      "cluster ids must be seed vec_ids")
    sd.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_members"))
      // a cluster always keeps its min-id member
      assert(r.getAs[Long]("n_kept") >= 1)
    }
    // the threshold sits inside the observed cosine range, so the corpus
    // must exercise BOTH paths overall (measured: drops in every cluster
    // at sf0.01, keeps everywhere)
    assert(sd.map(_.getAs[Long]("n_dropped")).sum > 0)
    assert(sd.map(_.getAs[Long]("n_kept")).sum > 0)
  }

  test("s_cluster_balance_sample: census closes, sparse cells keep all, dense cells hit the cap") {
    val r = Similarity.queries("s_cluster_balance_sample")(spark, sf).collect()
    val emb = Tables.t(spark, sf, "embeddings").count()
    assert(r.map(_.getAs[Long]("n_members")).sum == emb,
      "every vector must be assigned to exactly one cell")
    r.foreach { row =>
      val n = row.getAs[Long]("n_members")
      val kept = row.getAs[Long]("n_kept")
      assert(kept <= n)
      if (n <= 40) {
        // rate = 1.0: the exact 2^48 draw keeps everything
        assert(kept == n, s"uncapped cell dropped rows: $kept of $n")
        assert(row.getAs[Double]("rate6") == 1.0)
      } else {
        // capped cell: kept ~ Binomial(n, 40/n), E = 40 — allow 3 sigma
        val sigma = math.sqrt(40.0 * (1.0 - 40.0 / n))
        assert(math.abs(kept - 40.0) <= 3 * sigma + 1,
          s"capped cell of $n kept $kept, expected ~40")
      }
    }
  }

  test("s_centroid_drift: parity halves census every vector, cosines bounded, near-stable space") {
    val r = Similarity.queries("s_centroid_drift")(spark, sf).collect()
    val emb = Tables.t(spark, sf, "embeddings")
    assert(r.length == emb.select("label").distinct().count())
    assert(r.map(x => x.getAs[Long]("n0") + x.getAs[Long]("n1")).sum == emb.count())
    r.foreach { row =>
      val cos = row.getAs[Double]("centroid_cos")
      assert(cos >= -1.0 && cos <= 1.0)
      // the testdata embeddings are near-uniform noise, so each label's
      // centroid is a small-norm mean and the parity halves are nearly
      // independent draws — LOW alignment is the correct reading here
      // (on clustered data the same monitor reads ~1); assert only the
      // bound and that the norm comparison stays in the unit ballpark
      assert(math.abs(row.getAs[Double]("norm_delta")) < 1.0)
      assert(row.getAs[Long]("n0") > 0 && row.getAs[Long]("n1") > 0,
        "a parity half lost a label entirely — the join would silently drop it")
    }
    // deterministic: the monitor must re-read identically
    val r2 = Similarity.queries("s_centroid_drift")(spark, sf).collect()
    assert(r.map(_.toString).toSeq == r2.map(_.toString).toSeq)
  }

  test("e_cuped: variants census users, adjustment preserves the global mean") {
    val r = Events.queries("e_cuped")(spark, sf).collect()
    assert(r.length == 2)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(r.map(_.getAs[Long]("n_users")).sum == users)
    // CUPED centers on the GLOBAL pre-mean: the user-weighted mean of the
    // adjusted metric equals that of the raw metric (up to 6-dp rounding)
    val wPost = r.map(row =>
      row.getAs[Long]("n_users") * row.getAs[Double]("mean_post")).sum
    val wAdj = r.map(row =>
      row.getAs[Long]("n_users") * row.getAs[Double]("mean_adj")).sum
    assert(math.abs(wPost - wAdj) < 1e-2,
      s"global mean drifted: $wPost vs $wAdj")
    r.foreach(row => assert(row.getAs[Double]("var_reduction") <= 1.0))
  }
}
