package graft

import org.apache.spark.sql.DataFrame

/** File layout must never change query RESULTS: the same rows written as
  * one file per table or as a directory of part files (the realistic
  * large-corpus shape) must produce byte-identical answers. This is the
  * continuously-run form of the SCALE_SF1 round-11 multi-file gate, which
  * caught e_forward_fill's summation-order-sensitive rounding — the spec
  * includes that query so the regression stays pinned, plus one
  * representative per family (relational agg, dedup, text).
  */
class LayoutInvarianceSpec extends SparkSpec {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("single-file and multi-file ScaleUp layouts answer identically") {
    val root = java.nio.file.Files.createTempDirectory("layout-inv").toString
    val one = s"$root/one"
    val many = s"$root/many"
    ScaleUp.scale(spark, TestSpark.sf0001, one, copies = 2, files = 1)
    ScaleUp.scale(spark, TestSpark.sf0001, many, copies = 2, files = 4)

    val queries = Seq("q1_agg", "d_exact_dedup", "t_token_count", "e_forward_fill")
    queries.foreach { name =>
      val a = canon(SparkEntry.queries(name)(spark, one))
      val b = canon(SparkEntry.queries(name)(spark, many))
      assert(a == b, s"$name differs between layouts")
    }
  }

  test("coalesce stage-boundary mode is size-gated (r16 ADVICE: no unconditional localCheckpoint)") {
    // files >= cores: coalesce collapses nothing — no materialized copy
    assert(ScaleUp.boundaryMode(100L << 30, files = 32, parallelism = 32) == "none")
    assert(ScaleUp.boundaryMode(1L << 20, files = 64, parallelism = 32) == "none")
    // small scaled set, few files: in-memory localCheckpoint is right
    assert(ScaleUp.boundaryMode(500L << 20, files = 4, parallelism = 32) == "local")
    // the 2 GiB threshold is the edge: at it, still memory; past it, disk
    assert(ScaleUp.boundaryMode(2L << 30, files = 4, parallelism = 32) == "local")
    assert(ScaleUp.boundaryMode((2L << 30) + 1, files = 4, parallelism = 32) == "disk")
    // the failure mode the advice named: a huge scaled set bound for few
    // files must NOT be pinned into block-manager memory
    assert(ScaleUp.boundaryMode(50L << 30, files = 8, parallelism = 32) == "disk")
  }
}
