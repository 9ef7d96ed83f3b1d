package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted build-once / query-many IVF-PQ index (VERDICT r13 ask #1) —
  * the operational split of the one-shot `s_ivfpq_topk` composition
  * (FAISS IVFADC, Jégou et al. 2011): a WRITE-ONCE build pays the corpus
  * passes (coarse assignment + PQ coding) exactly once, and every later
  * query answers from the persisted artifacts with ZERO train work
  * in-span. This is the shape a 100 TB retrieval deployment actually
  * runs — the index is built at ingest, queries amortize it.
  *
  * Artifacts under one root (tmpdir, process-keyed — see [[rootFor]]):
  *   - `centroids/`  (cell INT, centroid DOUBLE[64]) — the coarse
  *     quantizer: per-label 9-dp-rounded mean vectors (the s_ivf_topk
  *     codebook discipline; label count is bounded, so this side is
  *     always broadcastable).
  *   - `codebook/`   (m INT, code INT, cw FLOAT[16]) — the PQ codebook:
  *     the first 8 vectors' 4×16 subvectors (the s_pq_topk sample
  *     codebook).
  *   - `vectors/`    PARTITIONED BY cell: (vec_id, embedding FLOAT[64],
  *     c0..c3 INT) — every corpus vector coded ONCE (argmax dot vs the
  *     codebook, 9-dp) and hash-routed to its coarse cell. The cell
  *     directories are what the query side PRUNES: an nprobe probe list
  *     is bounded driver-side metadata, so it lands in the scan as a
  *     LITERAL partition filter (static pruning, proven from executed
  *     scan metrics in AnnIndexSpec — the LayoutSpec device).
  *
  * Every discrete decision (cell argmax, code argmax) is a
  * 9-dp-rounded max-of-struct, so the DuckDB oracle replays the build
  * from the base table bit-for-bit (Similarity.annIndexCtesSql).
  *
  * Scale shape of the build: one broadcast-centroid assignment pass
  * (O(N·cells), cells bounded), one broadcast-codebook coding pass
  * (O(N·M·codes)), two partial-agg'd vec_id groupBys, one partitioned
  * write. No window, no data-sized collect, no all-pairs.
  */
object AnnIndex {
  val M = 4
  val sub = 16
  val nCodes = 8
  val nProbe = 3
  val batch = 4 // query ids: vec_id < 4
  val shortlist = 20
  val topK = 5

  /** Index root for corpus `d`. Process-keyed (pid suffix) so two driver
    * rounds benching the same corpus concurrently never read each
    * other's half-written artifacts (the nonce-dir discipline from the
    * streaming entries); within one JVM the key is stable, which is what
    * build-once/query-many needs. A production deployment would use a
    * content-addressed lake path instead.
    */
  def rootFor(d: String): java.io.File = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val pid = ProcessHandle.current().pid()
    new java.io.File(sys.props("java.io.tmpdir"), s"graft_ivfidx_${tag}_p$pid")
  }

  private[graft] def subspaces(v: Column, out: String): Column =
    explode(array((0 until M).map(m =>
      struct(lit(m).as("m"), slice(v, m * sub + 1, sub).as(out))): _*))

  /** Full (re)build of the index for corpus `d`; returns the root path.
    * Deterministic: rebuilding over the same corpus writes byte-identical
    * logical content, so build/query entries may run in any order.
    */
  def build(s: SparkSession, d: String): String = synchronized {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val cos = graft.functions.GraftFunctions.cosineSim _
    val dotN = graft.functions.GraftFunctions.dotProduct _
    val root = rootFor(d)
    val emb = graft.queries.Tables.t(s, d, "embeddings")
    val vecMean = graft.functions.VectorMean(64)
    val cents = emb.groupBy(col("label").cast("int").as("cell"))
      .agg(vecMean(col("embedding")).as("c0"))
      .select(col("cell"), transform(col("c0"), x => round(x, 9)).as("centroid"))
    cents.coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(root, "centroids").getAbsolutePath)
    val cb = emb.filter(col("vec_id") < nCodes)
      .select(col("vec_id").cast("int").as("code"),
        subspaces(col("embedding"), "cw").as("x"))
      .select(col("x.m").as("m"), col("code"), col("x.cw").as("cw"))
    cb.coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(root, "codebook").getAbsolutePath)
    val assigned = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cell"),
        round(cos(col("embedding"), col("centroid")), 9).as("c2c"))
      .groupBy("vec_id")
      .agg(first("embedding").as("embedding"),
        max(struct(col("c2c"), col("cell"))).getField("cell").as("cell"))
    // code EVERY vector once — the amortization the one-shot
    // s_ivfpq_topk query deliberately skipped
    val codes = emb
      .select(col("vec_id"), subspaces(col("embedding"), "sv").as("x"))
      .select(col("vec_id"), col("x.m").as("m"), col("x.sv").as("sv"))
      .join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"), col("code"),
        round(dotN(col("sv"), col("cw")), 9).as("dp"))
      .groupBy("vec_id", "m")
      .agg(max(struct(col("dp"), col("code"))).getField("code").as("code"))
      .groupBy("vec_id")
      .agg(max(when(col("m") === 0, col("code"))).as("c0"),
        max(when(col("m") === 1, col("code"))).as("c1"),
        max(when(col("m") === 2, col("code"))).as("c2"),
        max(when(col("m") === 3, col("code"))).as("c3"))
    assigned.join(codes, "vec_id")
      .select(col("cell"), col("vec_id"), col("embedding"),
        col("c0"), col("c1"), col("c2"), col("c3"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(new java.io.File(root, "vectors").getAbsolutePath)
    root.getAbsolutePath
  }

  /** Write the DELTA segment for corpus `d` against the FROZEN persisted
    * centroids/codebook at `root` (no retraining — the FAISS-add /
    * Lucene-segment discipline; the base tree is never mutated). The
    * synthetic delta is deterministic on both engines: the
    * vec_id % 7 == 3 subset, re-keyed +1,000,000, embeddings REVERSED.
    * Overwrites `vectors_delta/`; deterministic, so callers
    * (s_index_delta, s_index_compact) are order-independent.
    */
  def writeDeltaSegment(s: SparkSession, d: String, root: String): Unit = {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val cos = graft.functions.GraftFunctions.cosineSim _
    val dotN = graft.functions.GraftFunctions.dotProduct _
    val cents = s.read.parquet(s"$root/centroids")
    val cb = s.read.parquet(s"$root/codebook")
    val delta = graft.queries.Tables.t(s, d, "embeddings")
      .filter(col("vec_id") % 7 === 3)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        reverse(col("embedding")).as("embedding"))
    val assigned = delta.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cell"),
        round(cos(col("embedding"), col("centroid")), 9).as("c2c"))
      .groupBy("vec_id")
      .agg(first("embedding").as("embedding"),
        max(struct(col("c2c"), col("cell"))).getField("cell").as("cell"))
    val codes = delta
      .select(col("vec_id"), subspaces(col("embedding"), "sv").as("x"))
      .select(col("vec_id"), col("x.m").as("m"), col("x.sv").as("sv"))
      .join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"), col("code"),
        round(dotN(col("sv"), col("cw")), 9).as("dp"))
      .groupBy("vec_id", "m")
      .agg(max(struct(col("dp"), col("code"))).getField("code").as("code"))
      .groupBy("vec_id")
      .agg(max(when(col("m") === 0, col("code"))).as("c0"),
        max(when(col("m") === 1, col("code"))).as("c1"),
        max(when(col("m") === 2, col("code"))).as("c2"),
        max(when(col("m") === 3, col("code"))).as("c3"))
    assigned.join(codes, "vec_id")
      .select(col("cell"), col("vec_id"), col("embedding"),
        col("c0"), col("c1"), col("c2"), col("c3"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/vectors_delta")
  }

  /** Build-once gate: reuse the persisted artifacts when present (the
    * query-many path), build otherwise — so build/query entries are
    * order-independent in Verify's map iteration.
    */
  def ensure(s: SparkSession, d: String): String = synchronized {
    val root = rootFor(d)
    if (new java.io.File(new java.io.File(root, "vectors"), "_SUCCESS").exists())
      root.getAbsolutePath
    else build(s, d)
  }

  /** Drop the persisted artifacts for `d` (Verify/Bench teardown, the
    * layoutCleanup discipline). Idempotent.
    */
  def cleanup(d: String): Unit = synchronized {
    val root = rootFor(d)
    if (root.exists()) graft.util.Dirs.deleteRecursively(root)
  }
}
