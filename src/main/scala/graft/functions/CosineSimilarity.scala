package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two numeric-array columns
  * (`array<float>` or `array<double>` on either side, mixed freely — the
  * double side shows up when one input is an averaged centroid).
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`,
  * `graft.queries.Similarity.cosineHof`) evaluates its lambda interpreted,
  * one function call per element; this expression compiles to a tight Java
  * loop inside whole-stage codegen — the hot inner loop of brute-force ANN
  * at 100 TB. Single pass computes dot product and both norms.
  *
  * Null semantics: null if either array is null, if lengths differ, if any
  * element is null, or if either norm is zero — matching the higher-order
  * formulation, where a null element propagates through zip_with/aggregate.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // loop-invariant after binding; hoisted out of the per-row eval path
  @transient private lazy val leftIsFloat = isFloat(left)
  @transient private lazy val rightIsFloat = isFloat(right)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = leftIsFloat; val rf = rightIsFloat
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = $getX;
         |    double $yv = $getY;
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |    if ($denom == 0.0) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} = $dot / $denom;
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-API access for graft's native functions. */
object GraftFunctions {

  val cosineSimBuilder: Seq[Expression] => Expression = {
    case Seq(l, r) => CosineSimilarity(l, r)
    case other => throw new IllegalArgumentException(
      s"cosine_sim expects 2 arguments, got ${other.size}")
  }

  val dotProductBuilder: Seq[Expression] => Expression = {
    case Seq(l, r) => DotProduct(l, r)
    case other => throw new IllegalArgumentException(
      s"dot_product expects 2 arguments, got ${other.size}")
  }

  /** Evaluates a foldable, non-null literal parameter or fails with a
    * message naming the actual problem (arity errors say arity; literal
    * errors say which parameter is not a literal).
    */
  private def litParam(fn: String, name: String, e: Expression): Long = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: parameter '$name' must be a literal, got ${e.sql}")
    e.eval(null) match {
      case null => throw new IllegalArgumentException(
        s"$fn: parameter '$name' must not be NULL")
      case i: java.lang.Integer => i.toLong
      case l: java.lang.Long => l
      case s: java.lang.Short => s.toLong
      case b: java.lang.Byte => b.toLong
      case other => throw new IllegalArgumentException(
        s"$fn: parameter '$name' must be an integer literal, " +
          s"got ${e.sql} of type ${e.dataType.simpleString}")
    }
  }

  /** `minhash_sigs(text, k, n, seed)` — k/n/seed must be int literals. */
  val minHashBuilder: Seq[Expression] => Expression = {
    case Seq(c, k, n, s) =>
      MinHashSigs(c,
        litParam("minhash_sigs", "k", k).toInt,
        litParam("minhash_sigs", "n", n).toInt,
        litParam("minhash_sigs", "seed", s))
    case other => throw new IllegalArgumentException(
      s"minhash_sigs expects 4 arguments (text, k, n, seed), got ${other.size}")
  }

  /** `char_ngrams(text, n)` — n must be an int literal. */
  val charNgramsBuilder: Seq[Expression] => Expression = {
    case Seq(c, n) =>
      CharNgrams(c, litParam("char_ngrams", "n", n).toInt)
    case other => throw new IllegalArgumentException(
      s"char_ngrams expects 2 arguments (text, n), got ${other.size}")
  }

  /** `winnow_fps(text, k, w)` — k/w must be int literals. */
  val winnowBuilder: Seq[Expression] => Expression = {
    case Seq(c, k, w) =>
      WinnowFps(c,
        litParam("winnow_fps", "k", k).toInt,
        litParam("winnow_fps", "w", w).toInt)
    case other => throw new IllegalArgumentException(
      s"winnow_fps expects 3 arguments (text, k, w), got ${other.size}")
  }

  /** `gram_fps(text, k)` — k must be an int literal. */
  val gramFpsBuilder: Seq[Expression] => Expression = {
    case Seq(c, k) =>
      GramFps(c, litParam("gram_fps", "k", k).toInt)
    case other => throw new IllegalArgumentException(
      s"gram_fps expects 2 arguments (text, k), got ${other.size}")
  }

  val simHashBuilder: Seq[Expression] => Expression = {
    case Seq(c) => SimHash64(c)
    case other => throw new IllegalArgumentException(
      s"simhash64 expects 1 argument (text), got ${other.size}")
  }

  /** `argmax_sim(v, cosine, offset, ids, matrix)` — all but `v` must be
    * foldable literals (the frozen-quantizer tables are bounded catalog
    * metadata baked into the expression).
    */
  val argmaxSimBuilder: Seq[Expression] => Expression = {
    case Seq(v, cosE, offE, idsE, matE) =>
      def folded(name: String, e: Expression): Any = {
        if (!e.foldable) throw new IllegalArgumentException(
          s"argmax_sim: parameter '$name' must be a literal, got ${e.sql}")
        val r = e.eval(null)
        if (r == null) throw new IllegalArgumentException(
          s"argmax_sim: parameter '$name' must not be NULL")
        r
      }
      val ids = folded("ids", idsE).asInstanceOf[ArrayData].toIntArray()
      val matAd = folded("matrix", matE).asInstanceOf[ArrayData]
      val mat = Array.tabulate(matAd.numElements())(i =>
        matAd.getArray(i).toDoubleArray())
      ArgmaxSim(v,
        folded("cosine", cosE).asInstanceOf[Boolean],
        folded("offset", offE).asInstanceOf[Number].intValue(),
        ids, mat)
    case other => throw new IllegalArgumentException(
      s"argmax_sim expects 5 arguments (v, cosine, offset, ids, matrix), " +
        s"got ${other.size}")
  }

  /** `unicode_norm(str)` defaults to NFC; `unicode_norm(str, 'NFKC')` takes
    * any of the four forms as a foldable string literal.
    */
  val unicodeNormBuilder: Seq[Expression] => Expression = {
    case Seq(c) => NormalizeUnicode(c, "NFC")
    case Seq(c, f) if f.foldable =>
      NormalizeUnicode(c, String.valueOf(f.eval(null)))
    case other => throw new IllegalArgumentException(
      s"unicode_norm expects (str[, form-literal]), got ${other.size} arguments")
  }

  private def info = new ExpressionInfo(
    classOf[CosineSimilarity].getCanonicalName, "cosine_sim")

  private def unInfo = new ExpressionInfo(
    classOf[NormalizeUnicode].getCanonicalName, "unicode_norm")

  private def dotInfo = new ExpressionInfo(
    classOf[DotProduct].getCanonicalName, "dot_product")

  /** Idempotent runtime registration into an existing session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("cosine_sim")
    if (!registry.functionExists(id)) {
      registry.registerFunction(id, info, cosineSimBuilder)
    }
    val un = FunctionIdentifier("unicode_norm")
    if (!registry.functionExists(un)) {
      registry.registerFunction(un, unInfo, unicodeNormBuilder)
    }
    val dp = FunctionIdentifier("dot_product")
    if (!registry.functionExists(dp)) {
      registry.registerFunction(dp, dotInfo, dotProductBuilder)
    }
    val mh = FunctionIdentifier("minhash_sigs")
    if (!registry.functionExists(mh)) {
      registry.registerFunction(mh,
        new ExpressionInfo(classOf[MinHashSigs].getCanonicalName, "minhash_sigs"),
        minHashBuilder)
    }
    val sh = FunctionIdentifier("simhash64")
    if (!registry.functionExists(sh)) {
      registry.registerFunction(sh,
        new ExpressionInfo(classOf[SimHash64].getCanonicalName, "simhash64"),
        simHashBuilder)
    }
    val wf = FunctionIdentifier("winnow_fps")
    if (!registry.functionExists(wf)) {
      registry.registerFunction(wf,
        new ExpressionInfo(classOf[WinnowFps].getCanonicalName, "winnow_fps"),
        winnowBuilder)
    }
    val cn = FunctionIdentifier("char_ngrams")
    if (!registry.functionExists(cn)) {
      registry.registerFunction(cn,
        new ExpressionInfo(classOf[CharNgrams].getCanonicalName, "char_ngrams"),
        charNgramsBuilder)
    }
    val gf = FunctionIdentifier("gram_fps")
    if (!registry.functionExists(gf)) {
      registry.registerFunction(gf,
        new ExpressionInfo(classOf[GramFps].getCanonicalName, "gram_fps"),
        gramFpsBuilder)
    }
    val ax = FunctionIdentifier("argmax_sim")
    if (!registry.functionExists(ax)) {
      registry.registerFunction(ax,
        new ExpressionInfo(classOf[ArgmaxSim].getCanonicalName, "argmax_sim"),
        argmaxSimBuilder)
    }
    val tt = FunctionIdentifier("top_token_count")
    if (!registry.functionExists(tt)) {
      registry.registerFunction(tt,
        new ExpressionInfo(classOf[TopTokenCount].getCanonicalName,
          "top_token_count"),
        { case Seq(c) => TopTokenCount(c)
          case other => throw new IllegalArgumentException(
            s"top_token_count expects 1 argument (array), got ${other.size}") })
    }
  }

  /** Column API: `cosineSim(a, b)` after `ensureRegistered`. */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Column API: `dotProduct(a, b)` after `ensureRegistered`. */
  def dotProduct(a: Column, b: Column): Column = call_function("dot_product", a, b)

  /** Column API: n minhashes of k-char shingles, after `ensureRegistered`. */
  def minhashSigs(text: Column, k: Int, n: Int, seed: Long = 42L): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("minhash_sigs", text, lit(k), lit(n), lit(seed))
  }

  /** Column API: 48-bit md5-draw simhash of space-separated tokens (the
    * family is seedless — one md5 prefix per token, DuckDB-replayable).
    */
  def simhash64(text: Column): Column = call_function("simhash64", text)

  /** Column API: winnowed k-gram fingerprints, after `ensureRegistered`. */
  def winnowFps(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("winnow_fps", text, lit(k), lit(w))
  }

  /** Column API: all char-n-grams in order, after `ensureRegistered`. */
  def charNgrams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("char_ngrams", text, lit(n))
  }

  /** Column API: position-ordered k-gram md5-48 hashes, after
    * `ensureRegistered`.
    */
  def gramFps(text: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("gram_fps", text, lit(k))
  }

  /** Column API: `unicodeNorm(c, "NFC")` after `ensureRegistered`. */
  def unicodeNorm(c: Column, form: String = "NFC"): Column =
    call_function("unicode_norm", c, org.apache.spark.sql.functions.lit(form))

  /** Column API: frozen-quantizer argmax over a literal candidate
    * matrix, after `ensureRegistered` — see [[ArgmaxSim]].
    */
  def argmaxSim(v: Column, cosine: Boolean, offset: Int,
      ids: Seq[Int], mat: Seq[Seq[Double]]): Column = {
    import org.apache.spark.sql.functions.{array, lit}
    call_function("argmax_sim", v, lit(cosine), lit(offset),
      array(ids.map(lit): _*),
      array(mat.map(r => array(r.map(lit): _*)): _*))
  }

  /** Column API: max token multiplicity of a string array, after
    * `ensureRegistered` — see [[TopTokenCount]].
    */
  def topTokenCount(arr: Column): Column = call_function("top_token_count", arr)
}

/** `spark.sql.extensions=graft.functions.GraftSessionExtensions` path
  * for deployments (injects at session build; no runtime call needed).
  */
class GraftSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName, "cosine_sim"),
      GraftFunctions.cosineSimBuilder))
    ext.injectFunction((FunctionIdentifier("unicode_norm"),
      new ExpressionInfo(classOf[NormalizeUnicode].getCanonicalName, "unicode_norm"),
      GraftFunctions.unicodeNormBuilder))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "dot_product"),
      GraftFunctions.dotProductBuilder))
    ext.injectFunction((FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getCanonicalName, "minhash_sigs"),
      GraftFunctions.minHashBuilder))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getCanonicalName, "simhash64"),
      GraftFunctions.simHashBuilder))
    ext.injectFunction((FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getCanonicalName, "winnow_fps"),
      GraftFunctions.winnowBuilder))
    ext.injectFunction((FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getCanonicalName, "char_ngrams"),
      GraftFunctions.charNgramsBuilder))
    ext.injectFunction((FunctionIdentifier("gram_fps"),
      new ExpressionInfo(classOf[GramFps].getCanonicalName, "gram_fps"),
      GraftFunctions.gramFpsBuilder))
    ext.injectFunction((FunctionIdentifier("argmax_sim"),
      new ExpressionInfo(classOf[ArgmaxSim].getCanonicalName, "argmax_sim"),
      GraftFunctions.argmaxSimBuilder))
    ext.injectFunction((FunctionIdentifier("top_token_count"),
      new ExpressionInfo(classOf[TopTokenCount].getCanonicalName,
        "top_token_count"),
      { case Seq(c) => TopTokenCount(c)
        case other => throw new IllegalArgumentException(
          s"top_token_count expects 1 argument (array), got ${other.size}") }))
  }
}
