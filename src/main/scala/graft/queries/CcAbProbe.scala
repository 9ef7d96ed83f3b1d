package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B probe for VERDICT r20 item 4: two-phase
  * large-star/small-star connected components (Kiveris et al. 2014)
  * vs the corpus's pointer-doubled label-propagation CC
  * (Dedup.connectedComponentsFromEdges), on the REAL c_pretrain_build
  * pair stream at sf0.1. The existing CC is the referee: the prototype
  * must produce the identical (v, root) mapping, and the paired timing
  * decides adoption. MEASURED 2026-08-19 (sf0.1, local[32], min-of-3):
  * referee 0/0 both directions; pointer-doubled 0.362 s vs LS/SS
  * 1.398 s (2 iterations × [2 checkpoints + fixpoint compare] vs one
  * fused action per round) — NOT adopted; kept in-tree as the recorded
  * experiment (OPTIMIZATION_r21.md, VERDICT r20 item 4). LS/SS pays
  * off only where single-key skew breaks per-round label joins — the
  * regime where a deployment flips the algorithm.
  */
object CcAbProbe {

  /** Large-star/small-star CC: edges in as (src, dst); out (v, root)
    * for every non-root member, root = component min — the same
    * contract connectedComponentsFromEdges serves c_pretrain_build.
    */
  def ccLargeSmallStar(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // canonical undirected edge set as (hi, lo), hi > lo
    def canon(df: DataFrame): DataFrame =
      df.filter(col("src") =!= col("dst"))
        .select(greatest(col("src"), col("dst")).as("hi"),
          least(col("src"), col("dst")).as("lo"))
        .distinct()
    var e = canon(edges).localCheckpoint()
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // LARGE-STAR (Kiveris et al.): per node u over the symmetric view,
      // m = min(Γ(u) ∪ {u}); emit (v, m) for every strictly larger
      // neighbor v.
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val mu = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val afterLs = canon(
        sym.join(mu, "u").filter(col("v") > col("u"))
          .select(col("v").as("src"), col("m").as("dst")))
        .localCheckpoint()
      // SMALL-STAR: per node hi over its smaller neighbors N (all lo),
      // m = min(N); emit (v, m) for v ∈ N ∪ {hi}.
      val ms = afterLs.groupBy("hi").agg(min("lo").as("m"))
      val joined = afterLs.join(ms, "hi")
      val afterSs = canon(
        joined.select(col("hi").as("src"), col("m").as("dst"))
          .union(joined.select(col("lo").as("src"), col("m").as("dst"))))
        .localCheckpoint()
      // converged when the canonical edge set is a fixpoint
      converged =
        afterSs.exceptAll(e).limit(1).count() == 0 &&
        e.exceptAll(afterSs).limit(1).count() == 0
      e = afterSs
      it += 1
    }
    println(s"=== lsss iterations: $it")
    // fixpoint is a star per component: hi → component min
    e.groupBy(col("hi").as("v")).agg(min("lo").as("root"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // the exact c_pretrain_build stage-1..3 prefix, up to the pair stream
    val q = Dedup.corpusWithDups(spark, d)
      .select(col("doc_id"), col("lang"), col("text"),
        Text.tokens(col("text")).as("sp"))
      .select(col("doc_id"), col("lang"), col("text"),
        size(col("sp")).as("n_words"),
        graft.functions.GraftFunctions.topTokenCount(col("sp")).as("top_cnt"))
      .filter(col("n_words") >= 20 &&
        col("top_cnt").cast("double") / col("n_words") <= 0.15)
      .select(col("doc_id"), col("text"))
    val exact = q
      .withColumn("fp", md5(Text.normText(col("text"))))
      .withColumn("mn",
        min("doc_id").over(org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("doc_id") === col("mn"))
      .select(col("doc_id"), col("text"))
    val pairs = Dedup.minhashPairsOf(exact)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .localCheckpoint()
    println(s"=== pairs: ${pairs.count()}")

    def timeMin3(tag: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"=== $tag: min ${ts.map(_._1).min}%.3f s (runs ${ts.map(t => f"${t._1}%.2f").mkString(",")}; rows ${ts.head._2})")
    }

    // referee first: identical non-root mapping
    val a = Dedup.connectedComponentsFromEdges(pairs)
      .filter(col("v") =!= col("root")).select("v", "root")
    val b = ccLargeSmallStar(pairs).filter(col("v") =!= col("root"))
      .select("v", "root")
    val onlyA = a.exceptAll(b).count()
    val onlyB = b.exceptAll(a).count()
    println(s"=== referee: onlyA=$onlyA onlyB=$onlyB (must both be 0)")

    timeMin3("pointer-doubled (existing)") {
      Dedup.connectedComponentsFromEdges(pairs)
        .filter(col("v") =!= col("root")).count()
    }
    timeMin3("large-star/small-star (prototype)") {
      ccLargeSmallStar(pairs)
        .filter(col("v") =!= col("root")).count()
    }
    spark.stop()
  }
}
