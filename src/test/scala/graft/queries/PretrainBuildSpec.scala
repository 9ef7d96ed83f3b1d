package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}

/** Invariants of the end-to-end batch pretraining build (c_pretrain_build)
  * that are orthogonal to the DuckDB hash oracle: stage-boundary bounds
  * the composition must respect regardless of corpus content, plus the
  * work-dir cleanup contract.
  */
class PretrainBuildSpec extends SparkSpec {

  private val sf = TestSpark.sf0001

  test("c_pretrain_build: histogram respects every stage's bound; work dir cleaned") {
    // snapshot/diff, not a global-empty assertion (tolerances in TestDirs)
    val before = graft.TestDirs.nonceDirs("graft_pretrain_")
    val r = PretrainBuild.queries("c_pretrain_build")(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 7, "at most nShards=7 histogram rows")
    val shards = r.map(_.getAs[Long]("shard"))
    assert(shards.forall(s0 => s0 >= 0 && s0 < 7))
    assert(shards.distinct.length == shards.length)
    r.foreach { row =>
      val nDocs = row.getAs[Long]("n_docs")
      val nTok = row.getAs[Long]("n_tokens")
      assert(nDocs >= 1)
      // the gopher gate admits only docs with >= 20 words, so tokens per
      // shard are floored by 20 x docs — a violation means an unfiltered
      // doc leaked past stage 1
      assert(nTok >= 20 * nDocs, s"gopher floor violated: $nTok < 20*$nDocs")
      assert(row.getAs[String]("min_fp").matches("[0-9a-f]{32}"))
    }
    // dedup upper bound: the build can never emit more docs than the dup
    // corpus has DISTINCT contents (exact dedup keeps one per fingerprint;
    // near dedup and mixing only remove further)
    val distinctContents = Dedup.corpusWithDups(spark, sf)
      .select(md5(Text.normText(col("text")))).distinct().count()
    assert(r.map(_.getAs[Long]("n_docs")).sum <= distinctContents)
    // the nonce-keyed work dir must not survive the build (success path)
    val leftover = graft.TestDirs.nonceDirs("graft_pretrain_") -- before
    assert(leftover.isEmpty,
      s"work dirs left behind by this run: ${leftover.mkString(",")}")
  }

  test("c_pretrain_build: deterministic across runs (no RNG anywhere in the chain)") {
    val a = PretrainBuild.queries("c_pretrain_build")(spark, sf).collect()
    val b = PretrainBuild.queries("c_pretrain_build")(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
