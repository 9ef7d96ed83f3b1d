package graft.queries

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.{SparkEntry, SparkSpec, TestSpark}

/** Physical-plan regression guards for the scale properties that matter at
  * 100 TB: filter pushdown to the parquet scan, column pruning, broadcast
  * joins for dimension tables, TakeOrderedAndProject for top-k (no full
  * sort), and partial (map-side) aggregation.
  */
class PlanSpec extends SparkSpec {

  /** Pre-AQE physical plan (the full tree; plan strings truncate metadata). */
  private def plan(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001).queryExecution.sparkPlan

  private def scans(name: String): Seq[FileSourceScanExec] =
    plan(name).collectLeaves().collect { case f: FileSourceScanExec => f }.toSeq

  private def scanOf(name: String, table: String): FileSourceScanExec =
    scans(name).find(_.metadata("Location").contains(s"$table.parquet"))
      .getOrElse(fail(s"no parquet scan of $table in $name"))

  test("q1_agg: shipdate filter is pushed to the parquet scan and columns are pruned") {
    val sc = scanOf("q1_agg", "lineitem")
    // Catalyst rewrites to_date(ts) <= d into a pushable timestamp comparison
    assert(sc.metadata("PushedFilters").contains("LessThan(l_shipdate"))
    assert(sc.requiredSchema.fieldNames.toSet ==
      Set("l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus", "l_shipdate"))
    // map-side partial aggregation before the shuffle
    assert(plan("q1_agg").toString.contains("partial_sum"))
  }

  test("q3_join_topk: dim filters pushed, top-k is TakeOrderedAndProject not a full sort") {
    assert(scanOf("q3_join_topk", "customer").metadata("PushedFilters")
      .contains("EqualTo(c_mktsegment,BUILDING)"))
    assert(scanOf("q3_join_topk", "orders").metadata("PushedFilters")
      .contains("LessThan(o_orderdate"))
    assert(plan("q3_join_topk").toString.contains("TakeOrderedAndProject"))
  }

  test("q_join_broadcast: hinted dim join is BroadcastHashJoin; fact scan reads 2 columns") {
    assert(plan("q_join_broadcast").toString.contains("BroadcastHashJoin"))
    assert(scanOf("q_join_broadcast", "lineitem").requiredSchema.fieldNames.toSet ==
      Set("l_partkey", "l_quantity"))
  }

  test("q_topk: orderBy+limit plans as TakeOrderedAndProject") {
    assert(plan("q_topk").toString.contains("TakeOrderedAndProject(limit=10"))
  }

  test("q_semi_join: plans as LeftSemi with pushed selective filter") {
    assert(plan("q_semi_join").toString.contains("LeftSemi"))
    assert(scanOf("q_semi_join", "orders").metadata("PushedFilters")
      .contains("GreaterThan(o_totalprice,100000.0)"))
  }

  test("t_lang_stats: documents scan pruned to the two referenced columns") {
    assert(scanOf("t_lang_stats", "documents").requiredSchema.fieldNames.toSet ==
      Set("lang", "n_chars"))
  }

  test("d_minhash_lsh: band self-join reuses one shuffle (ReusedExchange after execution)") {
    // disable auto-broadcast: at test SF AQE broadcasts the tiny sig side
    // (fine there), but the 100 TB shape is the SMJ whose second side must
    // reuse the first side's shuffle — that's what this guards
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("d_minhash_lsh")(spark, TestSpark.sf0001)
      df.collect() // the final AQE plan only materializes on df's own execution
      assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
        "both sides of the band equi-join must share one canonical shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("e_click_attrib: interval join plans as an equi-join, never a nested loop") {
    val p = plan("e_click_attrib").toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      "time-bounded same-user join must shuffle on user, not cross-join")
  }

  test("q_range_join / q_asof_join: no nested-loop or cartesian fallback") {
    for (q <- Seq("q_range_join", "q_asof_join")) {
      val p = plan(q).toString
      assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
        s"$q must stay an equi-join shape")
    }
  }

  test("s_ann_recall: query-side joins broadcast; candidates meet via hash join") {
    assert(plan("s_ann_recall").toString.contains("BroadcastHashJoin"))
  }

  test("s_ivf_topk: probed-cell join broadcasts, top-k is TakeOrdered not a full sort") {
    val p = plan("s_ivf_topk").toString
    assert(p.contains("BroadcastHashJoin"), "cell membership must be a broadcast hash join")
    assert(p.contains("TakeOrderedAndProject"), "rerank top-k must not full-sort")
  }

  test("m_media_features: documents scan pruned to doc_id before media generation") {
    assert(scanOf("m_media_features", "documents").requiredSchema.fieldNames.toSet ==
      Set("doc_id"))
  }

  test("c_contamination: benchmark n-gram set meets the corpus via broadcast left-semi") {
    val p = plan("c_contamination").toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "the big side must not shuffle; the distinct benchmark grams broadcast")
  }

  test("c_pack_sequences: window partitions on shard (no single-partition global sort)") {
    val p = plan("c_pack_sequences").toString
    assert(p.contains("Window"))
    assert(!p.contains("SinglePartition"),
      "running-sum window must partition by shard, never collapse to one partition")
  }

  test("c_hash_sample / c_shard_assign: documents scan pruned to referenced columns") {
    assert(scanOf("c_hash_sample", "documents").requiredSchema.fieldNames.toSet ==
      Set("lang", "text"))
    assert(scanOf("c_shard_assign", "documents").requiredSchema.fieldNames.toSet ==
      Set("doc_id", "text", "n_chars"))
  }

  test("etl pipeline: conform collapses to a single Project per source branch (no shuffle)") {
    val engine = new graft.etl.MultiSourceAdEtl(graft.etl.Configs.apsl)
    val p = engine.run(spark, graft.etl.Fixtures.materialize("apsl"), capitalize = true)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("Exchange"), "reference-surface ETL must be shuffle-free")
    assert(p.contains("Union"))
  }
}
