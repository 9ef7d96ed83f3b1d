package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  *   - `<segment>_stats/` (cell INT, n BIGINT) — per-cell row counts
  *     written at every segment write: the catalog metadata the
  *     probe-cost ledgers read instead of rescanning vectors.
  *
  * [[buildKMeans]] writes the same artifact set under a `_km` root with
  * LEARNED cells (two-round Lloyd) instead of label cells; every query
  * API works unchanged against either tree.
  *
  * Every discrete decision (cell argmax, code argmax) is a
  * 9-dp-rounded max-of-struct, so the DuckDB oracle replays the build
  * from the base table bit-for-bit (Similarity.annIndexCtesSql).
  *
  * Scale shape of the build: ONE narrow literal-quantizer pass —
  * centroids and codebook are bounded catalog metadata (≤ cells·64 +
  * M·codes·16 values), collected once and re-entered as literal
  * expressions, so assignment (O(N·cells)) and coding (O(N·M·codes))
  * are per-row codegen'd argmaxes with ZERO shuffles of the corpus
  * payload before the partitioned write (r20: the former shape
  * shuffled the full payload through two vec_id groupBys + a join).
  * No window, no data-sized collect, no all-pairs.
  */
object AnnIndex {
  val M = 4
  val sub = 16
  val nCodes = 8
  val nProbe = 3
  val batch = 4 // query ids: vec_id < 4
  val shortlist = 20
  val topK = 5
  // operating-point floor for the cost-aware nprobe selector
  // (s_index_nprobe_select): smallest nprobe with recall_at_5 >= floor
  val recallFloor = 0.7

  /** Broadcast-safety bound on the shadow id sets [[querySegments]]
    * anti-joins (r18 VERDICT advisory #1: `broadcast()` is a hint the
    * planner honors regardless of size, so an update/delta batch that
    * grows to base scale would OOM the driver silently). Past this many
    * later-segment rows the query FAILS LOUDLY with a compact-first hint
    * — the bounded-scalar-extract license pattern (Text.collectBigramUnits).
    * 10M ids ≈ 80 MB raw — comfortably broadcastable on any executor
    * profile; [[compact]] itself never broadcasts (shuffle dedup), so
    * compaction is always available as the way out.
    */
  val maxShadowRows = 10000000L

  /** Index root for corpus `d`. Process-keyed (pid suffix) so two driver
    * rounds benching the same corpus concurrently never read each
    * other's half-written artifacts (the nonce-dir discipline from the
    * streaming entries); within one JVM the key is stable, which is what
    * build-once/query-many needs. A production deployment would use a
    * content-addressed lake path instead. `variant` distinguishes
    * alternative-quantizer builds of the SAME corpus (the "km" learned-
    * coarse-quantizer tree) from the label-cell default.
    */
  def rootFor(d: String, prime: Option[Int] = None,
      variant: Option[String] = None): java.io.File = {
    // variants share one naming rule with cleanup()'s sweep regex (r19
    // ADVICE: a variant outside the swept alphabet would leak its root
    // in tmp, and one shaped like `s<digits>` would collide with the
    // stratum `_sN` naming) — enforce both here, at the single place
    // every variant string enters
    variant.foreach(v => require(
      v.matches("[a-z][a-z0-9]*") && !v.matches("s\\d+"),
      s"index variant '$v' must be lowercase alphanumeric (not _sN-shaped)" +
        " so cleanup()'s sweep can find its root"))
    val tag = d.replaceAll("[^A-Za-z0-9]", "_") +
      prime.map(p => s"_s$p").getOrElse("") +
      variant.map(v => s"_$v").getOrElse("")
    val pid = ProcessHandle.current().pid()
    new java.io.File(sys.props("java.io.tmpdir"), s"graft_ivfidx_${tag}_p$pid")
  }

  /** The build corpus: the full embeddings table, or its 1-in-`prime`
    * md5 stratum (the Tables.stratum twin device — both engines filter
    * the base ids the same way, keeping the sf100 DuckDB replay at
    * ~1/41 volume while the engine still runs the full plan shape).
    */
  private def embFor(s: SparkSession, d: String,
      prime: Option[Int]): DataFrame = {
    val emb = graft.queries.Tables.t(s, d, "embeddings")
    prime.fold(emb)(p =>
      emb.filter(graft.queries.Tables.stratum(col("vec_id"), p)))
  }

  /** PQ codebook source rows with their code labels. Unstratified: the
    * first `n` vec_ids, code = vec_id (dense by construction).
    * Stratified: the `n` SMALLEST stratum vec_ids (vec_id < n would
    * mostly miss the 1-in-41 draw), re-labeled densely 0..n-1 by a
    * bounded ≤ n-row rank so the code_sum base-8 checksum stays
    * meaningful; the selection itself is TakeOrdered, never a
    * data-sized window. `n` defaults to the PQ codebook size; the
    * k-means build reuses the same rule for its `k` seeds (r19 VERDICT
    * ask #3: matched-k training needs more seeds than codes).
    */
  private def codebookRows(emb: DataFrame, prime: Option[Int],
      n: Int = nCodes): DataFrame =
    prime match {
      case None =>
        emb.filter(col("vec_id") < n)
          .select(col("vec_id").cast("int").as("code"), col("vec_id"),
            col("embedding"))
      case Some(_) =>
        emb.select(col("vec_id"), col("embedding"))
          .orderBy("vec_id").limit(n)
          .select((row_number().over(
              org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
              .cast("int").as("code"),
            col("vec_id"), col("embedding"))
    }

  private[graft] def subspaces(v: Column, out: String): Column =
    explode(array((0 until M).map(m =>
      struct(lit(m).as("m"), slice(v, m * sub + 1, sub).as(out))): _*))

  /** The frozen-parameter assignment/coding pass, LITERAL form (r20
    * optimization, guide §2.3/§2.4/§8 "decide with small rows"): the
    * coarse quantizer and PQ codebook are catalog-scale metadata
    * (cells·64 + M·codes·16 values), so they re-enter the pass as
    * literal expressions under the bounded-scalar-extract license the
    * query side's probe extract established. The former shape
    * crossJoined a broadcast centroid/codebook subplan and argmax'd via
    * two groupBy(vec_id) aggregates plus an equi-join — three exchanges
    * of the FULL corpus payload (embedding carried through every one)
    * per build, and each broadcast re-executed its source subplan. The
    * literal form computes the identical 9-dp argmaxes per row —
    * `greatest` over the same (metric, id) structs IS the former
    * max-of-struct ordering (ties → larger id) — in ONE narrow
    * codegen'd projection: zero corpus shuffles before the partitioned
    * write, and the FLOP count per row is unchanged (cells cosines +
    * M·codes dots either way). LiteralQuantizerSpec pins the
    * equivalence against the former broadcast-join formulation.
    */
  private def litVecD(xs: scala.collection.Seq[Double]): Column =
    array(xs.toSeq.map(lit): _*)

  /** (cell → centroid values) pairs from collected centroid rows. */
  private def centsLit(rows: Array[org.apache.spark.sql.Row]): Seq[(Int, Seq[Double])] =
    rows.toSeq.map(r =>
        (r.getAs[Int]("cell"),
          r.getAs[scala.collection.Seq[Double]]("centroid").toVector: Seq[Double]))
      .sortBy(_._1)

  /** (m → (code, codeword values) list) from collected codebook rows;
    * float codewords widen to double exactly (the metric arithmetic is
    * double either way).
    */
  private def cbLit(rows: Array[org.apache.spark.sql.Row]): Map[Int, Seq[(Int, Seq[Double])]] =
    rows.toSeq.map { r =>
      val cw: Seq[Double] = r.getAs[scala.collection.Seq[Any]]("cw") match {
        case s if s.nonEmpty && s.head.isInstanceOf[java.lang.Float] =>
          s.asInstanceOf[scala.collection.Seq[Float]].toVector.map(_.toDouble)
        case s => s.asInstanceOf[scala.collection.Seq[Double]].toVector
      }
      (r.getAs[Int]("m"), r.getAs[Int]("code"), cw)
    }.groupBy(_._1).map { case (m, cs) =>
      m -> cs.sortBy(_._2).map(c => (c._2, c._3))
    }

  /** Nearest-centroid cell of vector column `v` against literal
    * centroids: 9-dp-rounded cosine argmax, larger cell on ties — the
    * native [[graft.functions.ArgmaxSim]] expression, the exact former
    * max(struct(c2c, cell)) ordering behind one small codegen'd call.
    */
  private def cellExpr(v: Column, cents: Seq[(Int, Seq[Double])]): Column =
    graft.functions.GraftFunctions.argmaxSim(v, cosine = true, offset = 0,
      cents.map(_._1), cents.map(_._2))

  /** PQ code of subspace `m` of vector column `v` against a literal
    * codebook: 9-dp dot argmax over the subspace slice, larger code on
    * ties — [[graft.functions.ArgmaxSim]], the exact former
    * max(struct(dp, code)) ordering.
    */
  private def codeExpr(v: Column, m: Int, codes: Seq[(Int, Seq[Double])]): Column =
    graft.functions.GraftFunctions.argmaxSim(v, cosine = false,
      offset = m * sub, codes.map(_._1), codes.map(_._2))

  /** Assign + PQ-code every row in one narrow projection (see the
    * literal-form note above): same output columns and values as the
    * former broadcast-join pass, zero exchanges.
    */
  private def assignAndCode(rows: DataFrame, cents: Seq[(Int, Seq[Double])],
      cb: Map[Int, Seq[(Int, Seq[Double])]]): DataFrame =
    rows.select(cellExpr(col("embedding"), cents).as("cell"),
      col("vec_id"), col("embedding"),
      codeExpr(col("embedding"), 0, cb(0)).as("c0"),
      codeExpr(col("embedding"), 1, cb(1)).as("c1"),
      codeExpr(col("embedding"), 2, cb(2)).as("c2"),
      codeExpr(col("embedding"), 3, cb(3)).as("c3"))

  /** Write a collected bounded row set as a single-file parquet artifact
    * with the plan's exact schema — the artifact write no longer
    * re-executes the source subplan.
    */
  private def writeLocal(s: SparkSession, rows: Array[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType, path: String): Unit =
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Per-cell row counts of segment `seg`, persisted as `<seg>_stats/`
    * next to the tree — the catalog metadata a 100 TB index keeps at
    * write time so cost ledgers (s_index_probe_cost*) read ≤ cells
    * stats rows instead of re-scanning the vector tree per query (r18
    * VERDICT ask #7). One partial-agg'd pass over the just-written
    * segment, amortized over every later ledger read.
    */
  private def writeCellStats(s: SparkSession, root: String, seg: String): Unit =
    s.read.parquet(s"$root/$seg")
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/${seg}_stats")

  /** Full (re)build of the index for corpus `d` (or its 1-in-`prime`
    * stratum); returns the root path. Deterministic: rebuilding over the
    * same corpus writes byte-identical logical content, so build/query
    * entries may run in any order.
    */
  def build(s: SparkSession, d: String,
      prime: Option[Int] = None): String = synchronized {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val emb = embFor(s, d, prime)
    val vecMean = graft.functions.VectorMean(64)
    val cents = emb.groupBy(col("label").cast("int").as("cell"))
      .agg(vecMean(col("embedding")).as("c0"))
      .select(col("cell"), transform(col("c0"), x => round(x, 9)).as("centroid"))
    writeIndex(s, rootFor(d, prime), d, emb, cents, prime)
  }

  /** The LEARNED-coarse-quantizer build variant (r18 VERDICT ask #3):
    * cells are k-means centroids instead of the corpus LABEL values —
    * the last realism gap between the label-cell tree and FAISS-IVF
    * proper, and the variant that makes the recall curve respond to
    * TRAINING (s_index_recall_quantizers compares both trees at the
    * same probe budget). Training is the exact oracled s_kmeans
    * two-iteration Lloyd chain (first-k seeds, 9-dp-rounded cosine
    * argmax, larger-cluster tie-break, 9-dp-rounded round-1 means),
    * extended with one more 9-dp-rounded mean — the trained centroids —
    * and vectors are then assigned AGAINST the trained centroids (the
    * FAISS train-then-add discipline: the same frozen-parameter
    * assignment every later delta would use). PQ codebook and coding
    * are identical to the base build — the coarse quantizer is the ONLY
    * axis that moves, which is what makes the A/B recall row a clean
    * measurement. Each Lloyd round is one broadcast-k assignment pass +
    * one partial-agg'd mean — at 100 TB, two extra corpus passes at
    * build time, zero extra query cost.
    */
  def buildKMeans(s: SparkSession, d: String,
      prime: Option[Int] = None, k: Int = nCodes): String = synchronized {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val emb = embFor(s, d, prime)
    val vecMean = graft.functions.VectorMean(64)
    // Each Lloyd round: ONE corpus pass assigning against LITERAL
    // centroids (cellExpr — the identical 9-dp cosine argmax with the
    // larger-cell tie-break) + one partial-agg'd mean, COLLECTED at the
    // round boundary (≤ k 9-dp-rounded vectors — bounded driver
    // metadata, the probe-extract license). The former lazy chain
    // mean9(assign(mean9(assign(seeds)))) shuffled the full corpus
    // payload through a groupBy(vec_id) per round and re-executed the
    // growing lineage inside each round's broadcast.
    def assignLit(cents: Seq[(Int, Seq[Double])]): DataFrame =
      emb.select(col("vec_id"), col("embedding"),
        cellExpr(col("embedding"), cents).as("cl"))
    def mean9(assigned: DataFrame): Seq[(Int, Seq[Double])] =
      assigned.groupBy("cl").agg(vecMean(col("embedding")).as("c0"))
        .select(col("cl"), transform(col("c0"), x => round(x, 9)).as("cent"))
        .collect().toSeq
        .map(r => (r.getAs[Int]("cl"),
          r.getAs[scala.collection.Seq[Double]]("cent").toVector: Seq[Double]))
        .sortBy(_._1)
    // seeds follow the codebook's stratum-safe discipline: unstratified
    // = the first k vec_ids (cl = vec_id, the s_kmeans seed rule);
    // stratified = the k smallest stratum ids re-labeled densely. k
    // defaults to the historical nCodes (the r18 tree); matched-k
    // training (k = the label-cell count) separates the TRAINING effect
    // from the cell-count effect in the quantizer A/B (r19 VERDICT
    // ask #3 — the 8-seed tree partly measured having 8 cells vs 10).
    // Seed floats widen to double exactly (the cosine arithmetic is
    // double either way, so round 1 compares the identical operands).
    val seeds = codebookRows(emb, prime, k)
      .select(col("code").as("cl"), col("embedding").as("cent"))
      .collect().toSeq
      .map(r => (r.getAs[Int]("cl"),
        r.getAs[scala.collection.Seq[Float]]("cent")
          .toVector.map(_.toDouble): Seq[Double]))
      .sortBy(_._1)
    val trained = mean9(assignLit(mean9(assignLit(seeds))))
    import s.implicits._
    val cents = trained.toDF("cell", "centroid")
    writeIndex(s, rootFor(d, prime, Some(kmVariant(k))), d, emb, cents, prime)
  }

  /** Variant tag for the k-means tree: the historical `km` at the
    * default seed count, `km<k>` otherwise — distinct trees per k, all
    * swept by cleanup()'s generic variant pattern.
    */
  private[graft] def kmVariant(k: Int): String =
    if (k == nCodes) "km" else s"km$k"

  /** Element-wise 9-dp-rounded residual `x − centroid(cell)` of an
    * assigned row, against LITERAL centroids (a ≤ cells when-chain
    * instead of the former broadcast join). Embeddings cast to double
    * first so both engines subtract identical operands (float→double
    * widening is exact).
    */
  private def residualExpr(cellCol: Column,
      cents: Seq[(Int, Seq[Double])]): Column = {
    val centroidOf = cents.tail.foldLeft(
        when(cellCol === lit(cents.head._1), litVecD(cents.head._2))) {
      case (acc, (cl, cv)) => acc.when(cellCol === lit(cl), litVecD(cv))
    }
    zip_with(col("embedding").cast("array<double>"), centroidOf,
      (x, c) => round(x - c, 9))
  }

  /** The RESIDUAL-coded build variant (r19 VERDICT ask #6) — standard
    * IVF-PQ discipline (FAISS `by_residual`, Jégou et al. 2011 §III):
    * PQ-code the residual `x − centroid(cell)` instead of the raw
    * vector, so codes spend their precision on the WITHIN-cell offset
    * (cell identity is already carried by the partition) instead of
    * re-encoding the cell mean every code repeats. Same label cells,
    * same seed rule, same artifact layout — the CODING is the only
    * moving axis, which is what makes the raw-vs-residual recall A/B
    * (s_index_recall_residual) a clean measurement, exactly like the
    * quantizer A/B isolates the coarse axis. The codebook holds the
    * SEED rows' residuals; every vector's residual is then argmax-coded
    * against it (9-dp throughout, so DuckDB replays the subtraction and
    * both argmaxes bit-for-bit). Query-side ADC needs the query's
    * residual PER PROBED CELL — a bounded batch×nprobe LUT
    * (querySegments(residual = true)). Build cost at 100 TB: identical
    * passes to the raw build plus one broadcast-centroid subtract
    * folded into the coding pass; query cost: the qlut grows by the
    * nprobe factor, still driver-metadata scale.
    */
  def buildResidual(s: SparkSession, d: String,
      prime: Option[Int] = None): String = synchronized {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val emb = embFor(s, d, prime)
    val vecMean = graft.functions.VectorMean(64)
    val cents = emb.groupBy(col("label").cast("int").as("cell"))
      .agg(vecMean(col("embedding")).as("c0"))
      .select(col("cell"),
        transform(col("c0"), x => round(x, 9)).as("centroid"))
    val rootF = rootFor(d, prime, Some("res"))
    val root = rootF.getAbsolutePath
    // one bounded materialization of the centroid plan (see writeIndex);
    // the former shape re-executed it FOUR times (artifact write + the
    // assignCells/withResidual broadcasts of both the seed and the full
    // pass)
    val centRows = cents.collect()
    writeLocal(s, centRows, cents.schema, s"$root/centroids")
    val cl = centsLit(centRows)
    // residual codebook from the SEED rows only (bounded ≤ nCodes rows,
    // assigned + subtracted over a LOCAL relation): per-row argmax is
    // independent, so this equals slicing them out of the full
    // assignment
    val seedDf = codebookRows(emb, prime)
    val seedLocal = s.createDataFrame(
      java.util.Arrays.asList(seedDf.collect(): _*), seedDf.schema)
    val rcbDf = seedLocal
      .select(col("code"), col("embedding"),
        cellExpr(col("embedding"), cl).as("cell"))
      .select(col("code"), residualExpr(col("cell"), cl).as("rv"))
      .select(col("code"), subspaces(col("rv"), "cw").as("x"))
      .select(col("x.m").as("m"), col("code"), col("x.cw").as("cw"))
    val rcbRows = rcbDf.collect()
    writeLocal(s, rcbRows, rcbDf.schema, s"$root/codebook")
    val rcb = cbLit(rcbRows)
    // ONE corpus pass: assign, subtract, code — all literal-parameter
    // per-row expressions (the former shape ran the assignment subtree
    // TWICE through a vec_id self-join and shuffled the payload 3×)
    emb.select(col("vec_id"), col("embedding"),
        cellExpr(col("embedding"), cl).as("cell"))
      .select(col("cell"), col("vec_id"), col("embedding"),
        residualExpr(col("cell"), cl).as("rv"))
      .select(col("cell"), col("vec_id"), col("embedding"),
        codeExpr(col("rv"), 0, rcb(0)).as("c0"),
        codeExpr(col("rv"), 1, rcb(1)).as("c1"),
        codeExpr(col("rv"), 2, rcb(2)).as("c2"),
        codeExpr(col("rv"), 3, rcb(3)).as("c3"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/vectors")
    writeCellStats(s, root, "vectors")
    java.nio.file.Files.write(markerFile(rootF).toPath,
      fingerprint(d).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    root
  }

  /** [[ensure]] for the residual-coded tree. */
  def ensureResidual(s: SparkSession, d: String,
      prime: Option[Int] = None): String = synchronized {
    sweepStale
    val root = rootFor(d, prime, Some("res"))
    if (isFresh(root, d)) root.getAbsolutePath else buildResidual(s, d, prime)
  }

  /** Shared tail of both build flavors: materialize `cents` ONCE (a
    * bounded ≤ cells collect — the artifact parquet is written from the
    * collected rows, and the values re-enter the assignment pass as
    * literals; the former shape executed the centroid subplan twice,
    * once per artifact write and once inside the broadcast), same for
    * the ≤ M·codes codebook, then assign + code every vector in ONE
    * narrow zero-shuffle pass against the frozen literal artifacts,
    * write the cell-partitioned tree + its cell stats, marker LAST (a
    * crash mid-build leaves no marker, so ensure() rebuilds). Coding
    * EVERY vector once is the amortization the one-shot s_ivfpq_topk
    * query deliberately skipped.
    */
  private def writeIndex(s: SparkSession, rootF: java.io.File, d: String,
      emb: DataFrame, cents: DataFrame, prime: Option[Int]): String = {
    val root = rootF.getAbsolutePath
    val centRows = cents.collect()
    writeLocal(s, centRows, cents.schema, s"$root/centroids")
    val cbDf = codebookRows(emb, prime)
      .select(col("code"), subspaces(col("embedding"), "cw").as("x"))
      .select(col("x.m").as("m"), col("code"), col("x.cw").as("cw"))
    val cbRows = cbDf.collect()
    writeLocal(s, cbRows, cbDf.schema, s"$root/codebook")
    assignAndCode(emb, centsLit(centRows), cbLit(cbRows))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/vectors")
    writeCellStats(s, root, "vectors")
    java.nio.file.Files.write(markerFile(rootF).toPath,
      fingerprint(d).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    root
  }

  /** Write the DELTA segment for corpus `d` against the FROZEN persisted
    * centroids/codebook at `root` (no retraining — the FAISS-add /
    * Lucene-segment discipline; the base tree is never mutated). The
    * synthetic delta is deterministic on both engines: the
    * vec_id % 7 == 3 subset (of the 1-in-`prime` stratum when given —
    * the stratum-twin device), re-keyed +1,000,000, embeddings REVERSED.
    * Overwrites `vectors_delta/`; deterministic, so callers
    * (s_index_delta, s_index_compact) are order-independent.
    */
  def writeDeltaSegment(s: SparkSession, d: String, root: String,
      prime: Option[Int] = None): Unit = {
    graft.functions.GraftFunctions.ensureRegistered(s)
    // frozen artifacts are bounded catalog metadata: collect once and
    // re-enter as literals (the former broadcasts re-read both artifact
    // parquets and paid the groupBy/join argmax machinery per segment)
    val cents = centsLit(s.read.parquet(s"$root/centroids").collect())
    val cb = cbLit(s.read.parquet(s"$root/codebook").collect())
    val delta = embFor(s, d, prime)
      .filter(col("vec_id") % 7 === 3)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        reverse(col("embedding")).as("embedding"))
    assignAndCode(delta, cents, cb)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/vectors_delta")
    writeCellStats(s, root, "vectors_delta")
    java.nio.file.Files.write(deltaMarker(root).toPath,
      deltaMarkerContent(d, prime)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def deltaMarker(root: String) =
    new java.io.File(root, "_fingerprint_delta")
  private def tombMarker(root: String) =
    new java.io.File(root, "_fingerprint_tombstones")
  // Marker content carries the ARGUMENTS the cached artifact was derived
  // from, not just the corpus fingerprint (r17 ADVICE low: tombstones
  // cached for one segment list must not be silently reused for
  // another; same for the delta's stratum prime).
  private def deltaMarkerContent(d: String, prime: Option[Int]): String =
    fingerprint(d) + prime.map(p => s"|s$p").getOrElse("")
  private def tombMarkerContent(d: String, segments: Seq[String]): String =
    fingerprint(d) + "|" + segments.mkString(",")

  /** Build-once gate for the delta segment — the read-path counterpart of
    * [[ensure]] (VERDICT r15/r16: a QUERY entry must not pay the segment
    * WRITE inside its measured span every rep). The delta is a pure
    * deterministic function of the corpus + the frozen artifacts, so the
    * corpus fingerprint is the correct cache key: same corpus ⇒ same
    * bytes ⇒ reuse; regenerated corpus ⇒ marker mismatch ⇒ rewrite.
    * Ingest-cost entries (s_index_delta, s_index_compact) keep calling
    * [[writeDeltaSegment]] directly — the write IS what they measure.
    */
  def ensureDelta(s: SparkSession, d: String, root: String,
      prime: Option[Int] = None): Unit = synchronized {
    val fresh =
      new java.io.File(new java.io.File(root, "vectors_delta"), "_SUCCESS").exists() &&
        deltaMarker(root).exists() &&
        new String(java.nio.file.Files.readAllBytes(deltaMarker(root).toPath),
          java.nio.charset.StandardCharsets.UTF_8) ==
          deltaMarkerContent(d, prime)
    if (!fresh) writeDeltaSegment(s, d, root, prime)
  }

  /** Write the TOMBSTONE segment: delete-by-id, the one lifecycle verb
    * left after build/delta/compact (the Lucene `.del` / delta-lake
    * deletion-vector discipline) — deletes are a tiny id list written
    * NEXT TO the immutable segments, masked at query time by an
    * anti-join, and folded away by the next compaction. The synthetic
    * delete set is deterministic on both engines: every segment id with
    * vec_id % 11 == 5 (base AND delta — re-keyed delta ids included), so
    * the DuckDB replay is a WHERE predicate.
    *
    * PRECONDITION — deletes are GLOBAL, not segment-scoped: the query
    * mask anti-joins the id list AFTER the latest-segment-wins union, so
    * an id that is tombstoned and then RE-ADDED by a later segment stays
    * masked (spec-pinned in AnnIndexSpec). Lucene scopes `.del` to
    * segments older than the re-add; a deployment that needs
    * reinsert-after-delete must first compact the tombstones away (the
    * fold physically drops the dead rows, clearing the id for re-use)
    * before writing the re-add segment.
    */
  def writeTombstones(s: SparkSession, d: String, root: String,
      segments: Seq[String]): Unit = {
    segments.map(seg => s.read.parquet(s"$root/$seg").select(col("vec_id")))
      .reduce(_ unionByName _)
      .filter(col("vec_id") % 11 === 5)
      .distinct()
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/tombstones")
    java.nio.file.Files.write(tombMarker(root).toPath,
      tombMarkerContent(d, segments)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Write the UPDATE segment: a batch of EXISTING ids re-added with new
    * content — the third mutation verb (add = delta, delete = tombstone,
    * update = later-segment re-add). Same ids, new embeddings, re-coded
    * against the FROZEN artifacts; at query time the latest-segment-wins
    * mask in [[querySegments]] makes these rows shadow the base rows —
    * an upsert without ever rewriting the base tree. Deterministic on
    * both engines: the vec_id % 13 == 2 subset, embeddings REVERSED.
    */
  def writeUpdateSegment(s: SparkSession, d: String, root: String): Unit = {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val cents = centsLit(s.read.parquet(s"$root/centroids").collect())
    val cb = cbLit(s.read.parquet(s"$root/codebook").collect())
    val upd = graft.queries.Tables.t(s, d, "embeddings")
      .filter(col("vec_id") % 13 === 2)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
    assignAndCode(upd, cents, cb)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/vectors_updates")
    writeCellStats(s, root, "vectors_updates")
    java.nio.file.Files.write(updMarker(root).toPath,
      fingerprint(d).getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def updMarker(root: String) =
    new java.io.File(root, "_fingerprint_updates")

  /** [[ensureDelta]]'s counterpart for the update segment. */
  def ensureUpdates(s: SparkSession, d: String, root: String): Unit =
    synchronized {
      val fresh =
        new java.io.File(new java.io.File(root, "vectors_updates"),
          "_SUCCESS").exists() &&
          updMarker(root).exists() &&
          new String(java.nio.file.Files.readAllBytes(updMarker(root).toPath),
            java.nio.charset.StandardCharsets.UTF_8) == fingerprint(d)
      if (!fresh) writeUpdateSegment(s, d, root)
    }

  /** [[ensureDelta]]'s counterpart for the tombstone segment. */
  def ensureTombstones(s: SparkSession, d: String, root: String,
      segments: Seq[String]): Unit = synchronized {
    val fresh =
      new java.io.File(new java.io.File(root, "tombstones"), "_SUCCESS").exists() &&
        tombMarker(root).exists() &&
        new String(java.nio.file.Files.readAllBytes(tombMarker(root).toPath),
          java.nio.charset.StandardCharsets.UTF_8) ==
          tombMarkerContent(d, segments)
    if (!fresh) writeTombstones(s, d, root, segments)
  }

  /** Union per-segment row sets with LATEST-SEGMENT-WINS shadowing: a
    * row of segment i survives iff NO LATER segment contains its vec_id
    * ANYWHERE. `rows(i)` is what each segment contributes (possibly
    * probe-pruned); `fullSegs(i)` is the same segment UNPRUNED, the
    * source of the shadow id sets — the distinction is the r17 ADVICE
    * fix: an update re-assigns a row to the cell nearest its NEW
    * embedding, so the re-add can land in a cell outside the probe
    * list. A dedup computed over pruned rows only (the r16→r17 shape, a
    * max-of-struct on a segment index) never sees that update row and
    * lets the stale base row survive as a candidate — physical
    * substitution (what the s_index_query_updated oracle computes)
    * drops it. Shadow sets are later-segment id lists — update/delta
    * batches, bounded like the tombstone id list — so each anti-join
    * BROADCASTS; per-row cost is a hash probe, never a shuffle of the
    * candidate set (plan-guarded in AnnIndexSpec).
    */
  private def unionLatestWins(rows: Seq[DataFrame],
      fullSegs: Seq[DataFrame]): DataFrame = {
    // suffix id sets built by a BACKWARD fold (r18 ADVICE: the old
    // per-segment rebuild constructed O(S²) unions): suffix(i) reuses
    // suffix(i+1)'s plan, so each segment scan appears once per suffix
    // chain instead of once per earlier segment.
    val suffixes = fullSegs.drop(1)
      .scanRight(Option.empty[DataFrame])((seg, acc) =>
        Some(acc.fold(seg.select("vec_id"))(seg.select("vec_id").unionByName(_))))
    rows.zipWithIndex.map { case (df, i) =>
      suffixes(i).fold(df)(ids =>
        df.join(broadcast(ids.distinct()), Seq("vec_id"), "left_anti"))
    }.reduce(_ unionByName _)
  }

  /** Row count of segment `seg` under `root`, read from the
    * `<seg>_stats` catalog metadata written at every segment write (one
    * single-file ≤ cells-row parquet read, memoized per stats mtime so
    * repeat queries pay nothing), falling back to a count() scan ONLY
    * for a segment written without stats (the spec's synthetic v2
    * trees). r19 VERDICT ask #2 / ADVICE: the shadow-bound guard must
    * be a true metadata read — the round-18 guard ran two count() jobs
    * on every segmented query while the stats artifact already held the
    * number.
    */
  private val segRowsCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private[graft] def segmentRows(s: SparkSession, root: String,
      seg: String): Long = {
    val statsDir = new java.io.File(root, s"${seg}_stats")
    val success = new java.io.File(statsDir, "_SUCCESS")
    if (success.exists()) {
      val key = s"$root|$seg|${success.lastModified()}"
      segRowsCache.computeIfAbsent(key, _ =>
        java.lang.Long.valueOf(
          s.read.parquet(statsDir.getAbsolutePath)
            .agg(coalesce(sum("n"), lit(0L))).head().getLong(0))).longValue()
    } else s.read.parquet(s"$root/$seg").count()
  }

  /** Fold `segments` into ONE cell-partitioned tree at `root/out`,
    * applying latest-segment-wins over duplicate ids (segment order =
    * argument order — folding an UPDATE segment keeps only the newest
    * row per id, r17 VERDICT "What's wrong" #2: the old union
    * materialized duplicate vec_ids, which the single-segment query
    * path then served unmasked) and dropping tombstoned ids when a
    * tombstone segment is given — compaction HONORS deletes (the fold
    * is when the masked rows physically disappear; until then queries
    * anti-join the id list). One repartition-by-cell shuffle + a
    * partitioned write; codes and assignments are carried, never
    * re-derived (frozen-parameter discipline). AnnIndexSpec asserts the
    * invariances that make the fold safe online:
    * query(segments − tombstones) == query(compacted) and
    * query(base+updates − tombstones) == query(compact(base+updates)).
    */
  def compact(s: SparkSession, root: String, segments: Seq[String],
      out: String, tombstones: Option[String] = None): Unit = {
    val cols = Seq("cell", "vec_id", "embedding", "c0", "c1", "c2", "c3").map(col)
    // latest-segment-wins by SHUFFLE, not broadcast (r18 VERDICT
    // advisory #1): compaction is the remedy querySegments' bounded
    // shadow guard points at, so it must work at ANY segment size — tag
    // each row with its segment index, union, keep the max-seg row per
    // vec_id via one partial-agg'd max-of-struct. Unlike the query path
    // there is no probe pruning here, so deduping over the unioned rows
    // directly is exactly the r17 semantics (every row is present).
    val uni = segments.zipWithIndex.map { case (seg, i) =>
        s.read.parquet(s"$root/$seg").select(cols: _*)
          .withColumn("__seg", lit(i))
      }.reduce(_ unionByName _)
      .groupBy("vec_id")
      .agg(max(struct(col("__seg"), col("cell"), col("embedding"),
        col("c0"), col("c1"), col("c2"), col("c3"))).as("w"))
      .select(col("w.cell").as("cell"), col("vec_id"),
        col("w.embedding").as("embedding"), col("w.c0").as("c0"),
        col("w.c1").as("c1"), col("w.c2").as("c2"), col("w.c3").as("c3"))
    val live = tombstones.fold(uni)(tseg =>
      uni.join(broadcast(s.read.parquet(s"$root/$tseg")), Seq("vec_id"),
        "left_anti"))
    live.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/$out")
    writeCellStats(s, root, out)
  }

  /** Answer the standard 4-query batch FROM the persisted index at
    * `root`, reading the given `segments` (subdirectories of the root,
    * each a cell-partitioned coded-vector tree). This is the ONE query
    * plan for every lifecycle state a deployment serves: `Seq("vectors")`
    * is the freshly-built index, `Seq("vectors", "vectors_delta")` the
    * live pre-compaction state (base + delta segments), and
    * `Seq("vectors_compact")` the folded tree — compaction invariance
    * (merged == compacted, asserted in AnnIndexSpec) is exactly the
    * property that makes the fold safe to run online.
    *
    * Zero train work in-span: centroids/codebook/coded vectors all LOAD.
    * The per-query nprobe probe list is collected (≤ cells ints — bounded
    * driver-side metadata) and pushed as a LITERAL partition filter on
    * EVERY segment scan, so each tree reads only its probed cell
    * directories (executed-metric-asserted in AnnIndexSpec). ADC via the
    * broadcast ≤ batch·M·codes qlut; per-qid top-`shortlist` rank; exact
    * refine from the segments' stored embeddings to the final top-`topK`.
    * All rounding/tie-breaks are the s_ivfpq_topk contract, so DuckDB
    * replays the identical hierarchy from the base table.
    */
  def querySegments(s: SparkSession, d: String, root: String,
      segments: Seq[String], prime: Option[Int] = None,
      tombstones: Option[String] = None,
      nprobe: Int = nProbe,
      refineK: Int = shortlist,
      queries: Option[DataFrame] = None,
      maxShadow: Long = maxShadowRows,
      residual: Boolean = false): DataFrame = {
    val (rows, schema) = probeExtract(s, d, root, prime, queries, nprobe)
    queryFromProbe(s, root, segments, tombstones, refineK, queries.isDefined,
      maxShadow, residual, rows, schema)
  }

  /** A recall-vs-nprobe SWEEP over one tree: the probe ranking is
    * independent of the budget (each point's probe list is a PREFIX of
    * the max-budget ranking), so the sweep pays ONE bounded probe
    * extract instead of one per point (r20, guide §2.4 — the former
    * recall-curve span collected three identical ranking plans).
    * Returns (nprobe → query result) per sweep point, each identical to
    * the equivalent [[querySegments]] call.
    */
  def querySweep(s: SparkSession, d: String, root: String,
      segments: Seq[String], prime: Option[Int] = None,
      sweep: Seq[(Int, Int)],
      tombstones: Option[String] = None,
      queries: Option[DataFrame] = None,
      maxShadow: Long = maxShadowRows,
      residual: Boolean = false): Seq[(Int, DataFrame)] = {
    val maxNp = sweep.map(_._1).max
    val (rows, schema) = probeExtract(s, d, root, prime, queries, maxNp)
    sweep.map { case (np, rk) =>
      np -> queryFromProbe(s, root, segments, tombstones, rk,
        queries.isDefined, maxShadow, residual,
        rows.filter(_.getInt(3) <= np), schema)
    }
  }

  /** The bounded probe extract (≤ batch·nprobe rows, carrying the ≤
    * batch query vectors out, plus the rank for prefix slicing): the
    * probe ranking runs EXACTLY the cosine/round/tie-break plan it
    * always did, but its result — and the query batch itself — re-enter
    * the main plan as LOCAL relations. Before (r20), the probed subplan
    * executed TWICE (once collected for the literal partition filter,
    * once re-executed as the broadcast join input) and every
    * broadcast(qs) re-ran the query batch's base-table scan — 3-4
    * redundant passes over the embeddings source per query batch, each
    * its own AQE broadcast stage. At 100 TB those are real re-reads of
    * the corpus table; the collected rows are bounded driver metadata
    * either way (the cellList license).
    *
    * The query batch defaults to the SELF-QUERY panel (first `batch`
    * vec_ids; for the stratum twin the `batch` SMALLEST stratum ids —
    * TakeOrdered, never a global window). `queries` overrides it with
    * an EXTERNAL (qid, qv) batch — vectors NOT in the index, the
    * deployment's actual read API (r18 VERDICT ask #2): a user query
    * embedding is retrieved against the corpus, so no self-exclusion
    * applies. External qids must be disjoint from indexed vec_ids —
    * ENFORCED fail-loud in the query body (r19 ADVICE).
    */
  private def probeExtract(s: SparkSession, d: String, root: String,
      prime: Option[Int], queries: Option[DataFrame], nprobe: Int)
      : (Array[org.apache.spark.sql.Row], org.apache.spark.sql.types.StructType) = {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val cos = graft.functions.GraftFunctions.cosineSim _
    val cents = s.read.parquet(s"$root/centroids")
    val qsPlan = queries.getOrElse(
      prime.fold(
          embFor(s, d, None).filter(col("vec_id") < batch))(_ =>
          embFor(s, d, prime).orderBy("vec_id").limit(batch))
        .select(col("vec_id").as("qid"), col("embedding").as("qv")))
    val wp = Window.partitionBy("qid").orderBy(col("qc").desc, col("cell"))
    val probePlan = cents.crossJoin(broadcast(qsPlan))
      .select(col("qid"), col("cell"), col("qv"),
        round(cos(col("centroid"), col("qv")), 9).as("qc"))
      .withColumn("rn", row_number().over(wp)).filter(col("rn") <= nprobe)
      .select(col("qid"), col("cell"), col("qv"), col("rn"))
    (probePlan.collect(), probePlan.schema)
  }

  /** The query body over an already-collected probe extract. */
  private def queryFromProbe(s: SparkSession, root: String,
      segments: Seq[String],
      tombstones: Option[String],
      refineK: Int,
      external: Boolean,
      maxShadow: Long,
      residual: Boolean,
      probeRows: Array[org.apache.spark.sql.Row],
      pSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val cos = graft.functions.GraftFunctions.cosineSim _
    val dotN = graft.functions.GraftFunctions.dotProduct _
    val cents = s.read.parquet(s"$root/centroids")
    val cb = s.read.parquet(s"$root/codebook")
    val probed = s.createDataFrame(
      java.util.Arrays.asList(probeRows.map(r =>
        org.apache.spark.sql.Row(r.get(0), r.get(1))): _*),
      org.apache.spark.sql.types.StructType(pSchema.take(2)))
    // every qid surfaces in the probe rows (nprobe ≥ 1 against nonempty
    // centroids), so the query batch reconstructs exactly
    val qs = s.createDataFrame(
      java.util.Arrays.asList(probeRows.map(r => (r.get(0), r.get(2)))
        .distinct.map { case (q, v) =>
          org.apache.spark.sql.Row(q, v)
        }: _*),
      org.apache.spark.sql.types.StructType(Seq(pSchema(0), pSchema(2))))
    // bounded metadata extract (≤ cells ints): the probe list becomes a
    // LITERAL predicate so partition pruning is static at every segment
    // scan — a segment that holds no rows for a probed cell simply
    // contributes no directories
    val cellList = probeRows.map(_.getInt(1)).distinct.sorted
    val segCols = Seq("cell", "vec_id", "embedding", "c0", "c1", "c2", "c3")
    // latest-segment-wins per vec_id (r16 ADVICE: duplicate ids across
    // segments — an UPDATE written as a later-segment re-add — must mask
    // the older row, not double-count it in the ADC): each segment's
    // probe-PRUNED rows are anti-joined against the UNPRUNED id sets of
    // all later segments (see unionLatestWins — pruning first and
    // deduping after was the r17 ADVICE bug: an update that moved its id
    // to an unprobed cell left the stale base row serving). The current
    // corpus base+delta segments are id-disjoint by construction (delta
    // ids re-keyed +1,000,000), so there the mask is a semantics guard;
    // AnnIndexSpec drives it with genuinely overlapping segment lists,
    // including cell-moving re-adds.
    // boundedness guard (r18 VERDICT advisory #1): broadcast() is a hint
    // the planner honors regardless of size, so the documented
    // "update/delta batches are bounded" precondition must be ENFORCED,
    // not assumed — past the bound, fail loudly toward the remedy
    // (compact() dedups by shuffle and never broadcasts). Segment sizes
    // come from the <seg>_stats catalog metadata (r19 ask #2), so the
    // guard costs no job on the steady-state query path.
    if (segments.size > 1) {
      val shadowTotal = segments.drop(1).map(segmentRows(s, root, _)).sum
      require(shadowTotal <= maxShadow,
        s"latest-segment-wins shadow sets span $shadowTotal rows, past " +
          s"the broadcast-safe bound ($maxShadow); compact the segments " +
          "first (AnnIndex.compact folds latest-wins by shuffle)")
    }
    val segReads = segments.map(seg => s.read.parquet(s"$root/$seg"))
    val dedup = unionLatestWins(
      segReads.map(_.filter(col("cell").isin(cellList.map(Int.box): _*))
        .select(segCols.map(col): _*)),
      segReads)
    // external batches must use qids DISJOINT from every indexed id — a
    // colliding qid would silently return the query row as its own
    // neighbor (no self-exclusion applies). Enforce fail-loud (r19
    // ADVICE) against the probed candidate rows, the only place a
    // collision can surface: one bounded limit-1 semi-join over the
    // already-pruned cells, paid by external batches only.
    if (external) {
      // the qid batch is already collected (probe extract above), so the
      // membership test is a literal IN filter — same set semantics as
      // the former broadcast semi-join, one subplan fewer
      val qids = probeRows.map(_.get(0).asInstanceOf[Number].longValue())
        .distinct.map(Long.box)
      val clash = dedup
        .filter(col("vec_id").isin(qids: _*))
        .limit(1).count()
      require(clash == 0L,
        "external query qids collide with indexed vec_ids in the probed " +
          "cells; external batches must use qids disjoint from every " +
          "indexed id (a collision would serve the query row as its own " +
          "neighbor)")
    }
    // tombstone mask: the id list is bounded (a delete batch), so the
    // anti-join broadcasts — per-row cost is a hash probe, never a
    // shuffle of the candidate set
    val masked = tombstones.fold(dedup)(tseg =>
      dedup.join(broadcast(s.read.parquet(s"$root/$tseg")), Seq("vec_id"),
        "left_anti"))
    val joined = masked.join(broadcast(probed), "cell")
    // self-query panels exclude the query row itself; an external batch
    // has no self row to exclude
    val cand = if (!external)
      joined.filter(col("vec_id") =!= col("qid")) else joined
    // ADC lookup table. Raw coding: one qd per (qid, m, code). Residual
    // coding (residual = true, against a buildResidual tree): the codes
    // quantize x − centroid(cell), so the LUT uses the QUERY's residual
    // per probed cell — (qid, cell, m, code), still bounded
    // batch·nprobe·M·codes driver-metadata scale, broadcast either way.
    val qlut = if (!residual)
      cb.crossJoin(broadcast(qs))
        .select(col("qid"), col("m"), col("code"),
          round(dotN(slice(col("qv"), col("m") * sub + 1, lit(sub)),
            col("cw")), 9).as("qd"))
    else {
      val qres = probed.join(broadcast(cents), "cell")
        .join(broadcast(qs), "qid")
        .select(col("qid"), col("cell"),
          zip_with(col("qv").cast("array<double>"), col("centroid"),
            (x, c) => round(x - c, 9)).as("rqv"))
      cb.crossJoin(broadcast(qres))
        .select(col("qid"), col("cell"), col("m"), col("code"),
          round(dotN(slice(col("rqv"), col("m") * sub + 1, lit(sub)),
            col("cw")), 9).as("qd"))
    }
    val exploded = if (residual)
      cand.select(col("qid"), col("cell"), col("vec_id"),
        posexplode(array(col("c0"), col("c1"), col("c2"), col("c3")))
          .as(Seq("m", "code")))
    else
      cand.select(col("qid"), col("vec_id"),
        posexplode(array(col("c0"), col("c1"), col("c2"), col("c3")))
          .as(Seq("m", "code")))
    val short = exploded
      .join(broadcast(qlut),
        if (residual) Seq("qid", "cell", "m", "code")
        else Seq("qid", "m", "code"))
      .groupBy("qid", "vec_id")
      .agg(max(when(col("m") === 0, col("qd"))).as("d0"),
        max(when(col("m") === 1, col("qd"))).as("d1"),
        max(when(col("m") === 2, col("qd"))).as("d2"),
        max(when(col("m") === 3, col("qd"))).as("d3"))
      .select(col("qid"), col("vec_id"),
        round(col("d0") + col("d1") + col("d2") + col("d3"), 4).as("adc"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("adc").desc, col("vec_id"))))
      .filter(col("rn") <= refineK)
      .select("qid", "vec_id")
    short
      .join(cand.select(col("qid"), col("vec_id"), col("embedding")),
        Seq("qid", "vec_id"))
      .join(broadcast(qs), "qid")
      .select(col("qid"), col("vec_id"),
        round(cos(col("embedding"), col("qv")), 4).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rnk") <= topK)
      .select(col("qid"), col("rnk").cast("bigint").as("rnk"),
        col("vec_id"), col("cos"))
      .orderBy("qid", "rnk")
  }

  /** Cheap content fingerprint of the source embeddings table: sorted
    * (name, length, mtime) of every file under `d`/embeddings.parquet,
    * PLUS each file's first and last 4 KiB (r16 ADVICE: a corpus
    * regenerated within the same mtime second with the same byte length
    * must not serve a stale index — the parquet FOOTER sits in the tail
    * sample and carries row-group statistics, so same-shape different
    * content changes the digest). Bounded: ≤ 8 KiB read per part file,
    * never a data scan. Validated against the `_fingerprint` marker in
    * [[ensure]] (the marker also disambiguates two paths that sanitize
    * to the same root tag).
    */
  private[graft] def fingerprint(d: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    val src = new java.io.File(d, "embeddings.parquet")
    val md = java.security.MessageDigest.getInstance("MD5")
    val sample = 4096
    walk(src).foreach { f =>
      md.update(s"${f.getAbsolutePath}|${f.length()}|${f.lastModified()}\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      scala.util.Using.resource(
          new java.io.RandomAccessFile(f, "r")) { raf =>
        val head = new Array[Byte](math.min(sample.toLong, raf.length()).toInt)
        raf.readFully(head)
        md.update(head)
        if (raf.length() > sample) {
          val tail = new Array[Byte](
            math.min(sample.toLong, raf.length() - sample).toInt)
          raf.seek(raf.length() - tail.length)
          raf.readFully(tail)
          md.update(tail)
        }
      }
    }
    md.digest().map("%02x".format(_)).mkString
  }

  private def markerFile(root: java.io.File) = new java.io.File(root, "_fingerprint")

  /** One-shot JVM-startup sweep: delete `graft_ivfidx_*` tmpdir trees
    * whose pid suffix no longer names a live process — crashed runs
    * otherwise leak them forever (no later process shares the pid key).
    */
  private lazy val sweepStale: Unit = {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val mine = ProcessHandle.current().pid()
    Option(tmp.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.getName.startsWith("graft_ivfidx_")) {
        val pid = f.getName.reverse.takeWhile(_.isDigit).reverse
        if (pid.nonEmpty && pid.length < 18 && pid.toLong != mine) {
          val h = ProcessHandle.of(pid.toLong)
          if (!h.isPresent || !h.get().isAlive)
            graft.util.Dirs.deleteRecursively(f)
        }
      }
    }
  }

  /** Build-once gate: reuse the persisted artifacts when present AND the
    * `_fingerprint` marker still matches the source corpus (the
    * query-many path), rebuild otherwise — so build/query entries are
    * order-independent in Verify's map iteration and a corpus
    * regenerated in-place never serves a stale index.
    */
  def ensure(s: SparkSession, d: String,
      prime: Option[Int] = None): String = synchronized {
    sweepStale
    val root = rootFor(d, prime)
    if (isFresh(root, d)) root.getAbsolutePath else build(s, d, prime)
  }

  /** [[ensure]] for the learned-coarse-quantizer tree (per seed count). */
  def ensureKMeans(s: SparkSession, d: String,
      prime: Option[Int] = None, k: Int = nCodes): String = synchronized {
    sweepStale
    val root = rootFor(d, prime, Some(kmVariant(k)))
    if (isFresh(root, d)) root.getAbsolutePath
    else buildKMeans(s, d, prime, k)
  }

  private def isFresh(root: java.io.File, d: String): Boolean =
    new java.io.File(new java.io.File(root, "vectors"), "_SUCCESS").exists() &&
      markerFile(root).exists() && {
        val bytes = java.nio.file.Files.readAllBytes(markerFile(root).toPath)
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8) ==
          fingerprint(d)
      }

  /** Drop the persisted artifacts for `d` — the full root and EVERY
    * stratum-twin root regardless of prime (r16 ADVICE: the old
    * hardcoded Seq(None, Some(41)) silently leaked any other-prime
    * index). Matches this process's roots only (`_p<pid>` suffix), with
    * an exact-tag guard so a corpus whose sanitized tag is a PREFIX of
    * another's (sf1 vs sf1h) never deletes its neighbor. Idempotent.
    */
  def cleanup(d: String): Unit = synchronized {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val pid = ProcessHandle.current().pid()
    val plain = s"graft_ivfidx_${tag}_p$pid"
    // optional stratum suffix, then optional variant suffix matching the
    // GENERIC alphabet rootFor enforces (r19 ADVICE: the old `_km`
    // literal left any future variant un-swept), then this process's pid
    val strat = (java.util.regex.Pattern.quote(s"graft_ivfidx_$tag") +
      "(_s\\d+)?(_[a-z][a-z0-9]*)?_p" + pid).r
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    Option(tmp.listFiles()).getOrElse(Array.empty).foreach { f =>
      val n = f.getName
      if (n == plain || strat.matches(n))
        graft.util.Dirs.deleteRecursively(f)
    }
  }
}
