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
    assert(ScaleUp.boundaryMode(100L << 20, files = 4, parallelism = 32) == "local")
    // the memory budget counts DESERIALIZED size: compressed estimate ×
    // deserFactor against 2 GiB (r17 ADVICE low — a 2 GiB compressed set
    // would pin ~8 GiB of block-manager memory as 'local')
    assert(ScaleUp.boundaryMode((2L << 30) / ScaleUp.deserFactor,
      files = 4, parallelism = 32) == "local")
    assert(ScaleUp.boundaryMode((2L << 30) / ScaleUp.deserFactor + 1,
      files = 4, parallelism = 32) == "disk")
    assert(ScaleUp.boundaryMode(2L << 30, files = 4, parallelism = 32) == "disk")
    // the failure mode the advice named: a huge scaled set bound for few
    // files must NOT be pinned into block-manager memory
    assert(ScaleUp.boundaryMode(50L << 30, files = 8, parallelism = 32) == "disk")
  }

  test("perturb mode jitters replicated embeddings: copy 0 verbatim, one sign-flip per later copy") {
    // the r17 VERDICT tautology: verbatim vector replication pinned the
    // sf100 recall census at 1.0 (every top vector had `copies`
    // byte-identical twins); perturb must make later copies
    // near-but-distinct neighbors
    val root = java.nio.file.Files.createTempDirectory("emb-perturb").toString
    ScaleUp.scale(spark, TestSpark.sf0001, root, copies = 3, files = 1,
      perturb = true)
    val base = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val scaled = spark.read.parquet(s"$root/embeddings.parquet")
      .select("vec_id", "embedding").collect()
    assert(scaled.length == base.size * 3)
    var flipped = 0
    scaled.foreach { r =>
      val id = r.getLong(0)
      val k = id / ScaleUp.Base
      val v = r.getSeq[Float](1)
      val b = base(id % ScaleUp.Base)
      if (k == 0) assert(v == b, s"copy 0 of vec $id not verbatim")
      else {
        val diffs = v.zip(b).filter { case (x, y) => x != y }
        assert(diffs.size <= 1 &&
          diffs.forall { case (x, y) =>
            x == (-y * (1.0 + k / 4096.0)).toFloat },
          s"copy $k of vec $id: not a single scaled sign-flip")
        if (diffs.size == 1) flipped += 1
      }
    }
    // perturbing a zero component is a no-op, but random float
    // embeddings make that measure-zero: essentially every k>0 row moves
    assert(flipped > base.size, s"too few perturbed rows: $flipped")
    graft.util.Dirs.deleteRecursively(new java.io.File(root))
  }

  test("jittered copies stay distinct past 64 copies (no ≤65-variant collapse)") {
    // the r18 ADVICE regression class: a flip index derived from k alone
    // collides past 64 copies, so a 70-copy group of one base vector
    // collapsed to ≤ 65 distinct embeddings with byte-identical twins.
    // The row-keyed flip index + k-scaled magnitude must keep EVERY
    // replicated row distinct at any copy count.
    val root = java.nio.file.Files.createTempDirectory("emb-perturb70").toString
    ScaleUp.scale(spark, TestSpark.sf0001, root, copies = 70, files = 1,
      perturb = true)
    import org.apache.spark.sql.functions._
    val groups = spark.read.parquet(s"$root/embeddings.parquet")
      .select((col("vec_id") % ScaleUp.Base).as("base_id"), col("embedding"))
      .groupBy("base_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("embedding")).as("nd"))
      .collect()
    groups.foreach { r =>
      assert(r.getAs[Long]("n") == 70L)
      assert(r.getAs[Long]("nd") == 70L,
        s"base ${r.get(0)}: only ${r.getAs[Long]("nd")}/70 distinct variants")
    }
    graft.util.Dirs.deleteRecursively(new java.io.File(root))
  }
}
