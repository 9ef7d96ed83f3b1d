package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}

/** Full local referee for d_span_clusters: recompute the provenance
  * clusters WITHOUT the md5 draw — two docs are connected iff their
  * normalized texts share any 20-char substring (the hash only encodes
  * substring identity), so a plain Scala union-find over gram STRINGS must
  * reproduce the cluster-size histogram and min-roots exactly. This checks
  * the whole pipeline (gram extraction, star edges, label-min convergence)
  * against an implementation that shares none of its moving parts.
  */
class SpanClusterSpec extends SparkSpec {

  private val sf = TestSpark.sf0001

  test("d_span_clusters: histogram matches a hash-free local union-find referee") {
    val result = Dedup.queries("d_span_clusters")(spark, sf).collect()
      .map(r => (r.getAs[Long]("cluster_size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("min_root"))).toSeq
    assert(result.nonEmpty)

    val k = 20
    val docs = Dedup.corpusWithDups(spark, sf)
      .select(col("doc_id"), Text.normText(col("text")).as("nt"))
      .filter(length(col("nt")) >= k)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("nt"))
    // gram string -> docs containing it (CHAR windows, same as the query)
    val byGram = scala.collection.mutable.HashMap.empty[String, List[Long]]
    docs.foreach { case (id, nt) =>
      (0 to nt.length - k).foreach { i =>
        val g = nt.substring(i, i + k)
        byGram(g) = id :: byGram.getOrElse(g, Nil)
      }
    }
    // union-find over docs sharing a gram in >= 2 distinct docs
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clustered = scala.collection.mutable.HashSet.empty[Long]
    byGram.values.foreach { ds =>
      val distinct = ds.distinct
      if (distinct.length >= 2) {
        clustered ++= distinct
        distinct.tail.foreach(union(distinct.head, _))
      }
    }
    val comps = clustered.toSeq.groupBy(find)
    val expected = comps.toSeq
      .map { case (_, members) => (members.size.toLong, members.min) }
      .groupBy(_._1)
      .map { case (size, v) => (size, v.size.toLong, v.map(_._2).min) }
      .toSeq.sortBy(_._1)
    assert(result == expected,
      s"histogram diverged:\n got      $result\n expected $expected")
    // planted twins (2k, 2k+1 for doc_id%5==0) must share a cluster
    val twinIds = docs.map(_._1).filter(id => id % 10 == 0 && docs.exists(_._1 == id + 1))
    assert(twinIds.nonEmpty)
    twinIds.foreach { id =>
      assert(clustered.contains(id) && clustered.contains(id + 1) &&
        find(id) == find(id + 1), s"twins $id/${id + 1} not co-clustered")
    }
  }

  /** The gh-window skew exposure, pinned: a BOILERPLATE gram shared by
    * every document is the pathological input for `Window.partitionBy
    * ("gh")` — the whole group lands on one partition. The star-edge
    * construction bounds what that group can COST downstream: m docs
    * sharing a gram emit exactly m−1 hub→member edges, never an m²
    * clique, so the per-group work is the window's local min scan (linear)
    * plus a linear edge stream. 1,000 docs sharing one 20-gram: the edge
    * count is exactly 999 and the full query still produces the single
    * correct cluster. (At 100 TB the residual exposure is the one-partition
    * sort of the hyper-frequent group itself; the documented refinement —
    * prefix-sharding the gram hash — changes only the partitioning key,
    * not this edge bound.)
    */
  test("spanEdges: hyper-frequent gram stays linear (star edges, no clique) and clusters correctly") {
    import spark.implicits._
    val m = 1000
    val boiler = "zqxjkvbwpfmghdlcrtns" // exactly 20 chars, one shared gram
    // each doc: the shared boilerplate + a filler unique to the doc (every
    // 20-gram touching the filler contains a full "u%04d" block, so no
    // cross-doc gram exists besides the boilerplate); ids ≡ 1 (mod 5) keep
    // corpusWithDups from planting extra copies
    val docs = (0 until m).map { i =>
      (5L * i + 1, boiler + (f"u$i%04d" * 5))
    }
    val dir = java.nio.file.Files.createTempDirectory("skew-docs").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // The boilerplate gram itself contributes exactly m−1 edges. Boundary
    // grams (boiler suffix + filler digit-prefix) form a handful of extra
    // shared classes — each doc belongs to at most 4 of them (one per
    // shared digit-prefix length), each ALSO star-shaped — so the total
    // stays a small constant × m (measured: 2,700 = 2.7m) against the
    // clique's m(m−1)/2 = 499,500. That factor-185 gap is the skew bound
    // this spec pins.
    val nEdges = Dedup.spanEdges(spark, dir).count()
    assert(nEdges >= m - 1 && nEdges < 5L * m,
      s"hyper-frequent gram must stay linear in m: got $nEdges edges for $m docs")
    // hub = the min corpus doc id (doc_id*2 after corpusWithDups)
    assert(Dedup.spanEdges(spark, dir)
      .agg(org.apache.spark.sql.functions.min("src")).head.getLong(0) == 2L)

    val hist = Dedup.queries("d_span_clusters")(spark, dir).collect()
    assert(hist.length == 1)
    assert(hist(0).getAs[Long]("cluster_size") == m.toLong)
    assert(hist(0).getAs[Long]("n_clusters") == 1L)
    assert(hist(0).getAs[Long]("min_root") == 2L)

    // the pair's other member on the same pathological corpus: d_dup_spans'
    // gh window sees the one m-doc gram group and must still emit one
    // correct span per doc (each doc's duplicated region covers the
    // boilerplate plus the shared digit-prefix boundary grams — strictly
    // less than the whole text, since the per-doc unique filler tail is
    // nowhere duplicated)
    val spans = Dedup.queries("d_dup_spans")(spark, dir).collect()
    assert(spans.length == m)
    assert(spans.forall(_.getAs[Long]("dup_chars") >= boiler.length.toLong))
    assert(spans.forall(r => r.getAs[Double]("dup_frac") < 1.0))
  }
}
