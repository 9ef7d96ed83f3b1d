package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}

/** Invariant tests for quality-aware dedup (c_dedup_keep_best), the split
  * leakage guard (c_leakage_split), and PCA power iteration (s_pca_project).
  */
class CurationSplitSpec extends SparkSpec {

  private val sf = TestSpark.sf0001

  test("c_dedup_keep_best: survivors = distinct fingerprints, coverage exact") {
    val r = Curation.queries("c_dedup_keep_best")(spark, sf).collect()
    val corpus = Dedup.corpusWithDups(spark, sf)
    assert(r.map(_.getAs[Long]("n_docs")).sum == corpus.count())
    val nFps = corpus
      .select(md5(Text.normText(col("text"))).as("fp")).distinct().count()
    assert(r.map(_.getAs[Long]("n_kept")).sum == nFps)
    assert(r.exists(_.getAs[Long]("chars_dropped") > 0), "expect planted dupes to drop chars")
  }

  test("c_leakage_split: fingerprint strategy leaks zero, id strategy leaks the dupes") {
    val r = Curation.queries("c_leakage_split")(spark, sf).collect()
      .map(row => row.getAs[String]("strategy") -> row).toMap
    assert(r.keySet == Set("by_fingerprint", "by_doc_id"))
    val fp = r("by_fingerprint"); val id = r("by_doc_id")
    assert(fp.getAs[Long]("n_docs") == id.getAs[Long]("n_docs"))
    assert(fp.getAs[Long]("n_splits") == 3 && id.getAs[Long]("n_splits") == 3)
    assert(fp.getAs[Long]("n_leaked_fps") == 0L,
      "splitting by content fingerprint can never straddle a duplicate group")
    assert(id.getAs[Long]("n_leaked_fps") > 0L,
      "planted duplicate texts with different ids must leak under id-keyed splits")
  }

  test("s_pca_project: top component captures more variance than a raw axis") {
    val r = Similarity.queries("s_pca_project")(spark, sf).collect()
    val n = r.map(_.getAs[Long]("n")).sum
    assert(n == Tables.t(spark, sf, "embeddings").count())
    // centered projections sum to ~0 (weighted by group size; 4-dp rounding)
    val weightedMean = r.map(row =>
      row.getAs[Double]("avg_proj") * row.getAs[Long]("n")).sum / n
    assert(math.abs(weightedMean) < 1e-2, s"weighted mean proj $weightedMean")
    // variance along the learned component beats the first raw axis —
    // power iteration must have moved v somewhere better than a basis vector
    val varAlong = r.map(row =>
      row.getAs[Double]("var_along") * row.getAs[Long]("n")).sum / n
    val emb = Tables.t(spark, sf, "embeddings")
      .select(col("embedding").getItem(0).cast("double").as("x0"))
    val axisVar = emb.agg(var_pop("x0")).head().getDouble(0)
    assert(varAlong > axisVar,
      s"PC1 variance $varAlong should exceed axis-0 variance $axisVar")
  }
}
