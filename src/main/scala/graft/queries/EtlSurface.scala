package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.MultiSourceAdEtl
import Tables._

/** The reference-surface operators (SURVEY §2) exercised over the driver's
  * testdata tables so the DuckDB oracle can check them: null-keeping
  * anti-filter (P8), metadata capitalize (P2), schema conform with typed
  * nulls + casts (P4–P6), UNION ALL of conformed branches (U1), min/max
  * date aggregation (A1), Excel-serial date math (E13), regex
  * replace/extract/contains (E4/E6/E8), conditionals (P9).
  */
object EtlSurface {

  val queries: Map[String, Q] = Map(
    // The flagship reference pipelines end-to-end (read → detect → clean →
    // standardize → merge) over the deterministic fixture CSVs — the
    // testdata dir carries no ad exports, so these are rows-only checks
    // (the DuckDB oracle sees only the testdata tables).
    "etl_pipeline_apsl" -> ((s, _) =>
      new MultiSourceAdEtl(graft.etl.Configs.apsl)
        .run(s, graft.etl.Fixtures.materialize("apsl"), capitalize = true)
        .orderBy("Source", "Day")),
    "etl_pipeline_like_eat" -> ((s, _) =>
      new MultiSourceAdEtl(graft.etl.Configs.likeEat)
        .run(s, graft.etl.Fixtures.materialize("like_eat"), capitalize = true)
        .orderBy("Source", "일")),
    "etl_pipeline_mnb" -> ((s, _) =>
      new MultiSourceAdEtl(graft.etl.Configs.mnb)
        .run(s, graft.etl.Fixtures.materialize("mnb"), capitalize = false)
        .orderBy("Source", "Day")),
    "etl_pipeline_podl" -> ((s, _) =>
      new MultiSourceAdEtl(graft.etl.Configs.podl)
        .run(s, graft.etl.Fixtures.materialize("podl"), capitalize = false)
        .orderBy("Source", "Day")),
    "etl_pipeline_kcon" -> ((s, _) =>
      new MultiSourceAdEtl(graft.etl.Configs.kcon)
        .run(s, graft.etl.Fixtures.materialize("kcon"), capitalize = false)
        .orderBy("Source", "Day")),

    // P8/E1: Polars `remove` translation — rows with a NULL predicate are
    // KEPT (filter(!coalesce(pred, false))), via the engine's removeRows.
    "etl_remove_prefix" -> ((s, d) => {
      val ev = Tables.events(s, d)
      MultiSourceAdEtl.removeRows(ev, ev("event_type").startsWith("c"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("event_type")
    }),

    // P2: metadata-level column-name capitalize (first upper, rest lower).
    "etl_capitalize_names" -> ((s, d) => {
      val n = t(s, d, "nation")
      n.toDF(n.columns.map(MultiSourceAdEtl.capitalizeName).toIndexedSeq: _*)
        .orderBy("N_nationkey")
    }),

    // P4–P6: conform to a declared schema — missing column as typed null,
    // extras dropped, order forced, every column cast. One Project, via the
    // engine's own conform helper so the corpus exercises the real code path.
    "etl_conform_schema" -> ((s, d) => {
      val declared = StructType(Seq(
        StructField("p_partkey", LongType), StructField("p_name", StringType),
        StructField("p_size", LongType), StructField("p_retailprice", DoubleType),
        StructField("discontinued", StringType)))
      MultiSourceAdEtl.conformTo(t(s, d, "part"), declared).orderBy("p_partkey")
    }),

    // U1: UNION ALL of two independently-conformed branches, then agg.
    "etl_union_conform" -> ((s, d) => {
      val o = t(s, d, "orders")
      val open = o.filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val done = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderstatus"),
          lit(null).cast(DoubleType).as("o_totalprice"))
      open.unionByName(done)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), round(sum(coalesce(col("o_totalprice"), lit(0.0))), 2).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // A1/A2: full-column min/max date aggregation (the filename-range op).
    "etl_minmax_date" -> ((s, d) =>
      t(s, d, "orders").agg(
        min(to_date(col("o_orderdate"))).as("min_day"),
        max(to_date(col("o_orderdate"))).as("max_day"))),

    // E13: Date → Excel serial (days since 1899-12-30), as the Sheets sink does.
    "etl_excel_serial" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("serial",
          datediff(to_date(col("o_orderdate")), to_date(lit("1899-12-30"))).cast("bigint"))
        .groupBy("o_orderstatus")
        .agg(min("serial").as("min_serial"), max("serial").as("max_serial"),
          count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")),

    // E4/E2: regexp_replace incl. anchored literal-suffix strip.
    "etl_regex_replace" -> ((s, d) =>
      t(s, d, "part")
        .withColumn("name_norm",
          regexp_replace(regexp_replace(col("p_name"), "\\s+", " "), " (gizmo|widget)$", " item"))
        .groupBy("name_norm")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("name_norm")),

    // E6/E7: null-on-no-match extraction (nullif-wrapped regexp_extract) +
    // null test branching (P10).
    "etl_regex_extract" -> ((s, d) =>
      t(s, d, "part")
        .withColumn("brand_num",
          nullif(regexp_extract(col("p_brand"), "Brand#(\\d+)", 1), lit("")).cast("bigint"))
        .withColumn("bucket",
          when(col("brand_num").isNull, lit("none"))
            .when(col("brand_num") < 10, lit("low"))
            .otherwise(lit("high")))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"), min("brand_num").as("min_num"), max("brand_num").as("max_num"))
        .orderBy("bucket")),

    // E8/P9: regex containment + multi-branch conditional.
    "etl_rlike_case" -> ((s, d) =>
      t(s, d, "part")
        .withColumn("kind",
          when(col("p_type").rlike("^(ECONOMY|STANDARD)$"), lit("basic"))
            .when(col("p_type").rlike("PROMO"), lit("promo"))
            .otherwise(lit("other")))
        .groupBy("kind")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("kind"))
  )

  val oracles: Map[String, String] = Map(
    "etl_remove_prefix" ->
      """SELECT event_type, count(*) AS cnt FROM events
        |WHERE NOT coalesce(starts_with(event_type, 'c'), false)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "etl_capitalize_names" ->
      """SELECT n_nationkey AS "N_nationkey", n_name AS "N_name", n_regionkey AS "N_regionkey"
        |FROM nation ORDER BY 1""".stripMargin,
    "etl_conform_schema" ->
      """SELECT p_partkey, p_name, CAST(p_size AS BIGINT) AS p_size, p_retailprice,
        |CAST(NULL AS VARCHAR) AS discontinued FROM part ORDER BY p_partkey""".stripMargin,
    "etl_union_conform" ->
      """SELECT o_orderstatus, count(*) AS cnt, round(sum(coalesce(o_totalprice, 0.0)),2) AS sum_price
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE) AS o_totalprice
        |  FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "etl_minmax_date" ->
      """SELECT min(CAST(o_orderdate AS DATE)) AS min_day,
        |max(CAST(o_orderdate AS DATE)) AS max_day FROM orders""".stripMargin,
    "etl_excel_serial" ->
      """SELECT o_orderstatus,
        |min(date_diff('day', DATE '1899-12-30', CAST(o_orderdate AS DATE))) AS min_serial,
        |max(date_diff('day', DATE '1899-12-30', CAST(o_orderdate AS DATE))) AS max_serial,
        |count(*) AS cnt
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "etl_regex_replace" ->
      """SELECT regexp_replace(regexp_replace(p_name, '[ \t\n\x0B\f\r]+', ' ', 'g'), ' (gizmo|widget)$', ' item') AS name_norm,
        |count(*) AS cnt FROM part GROUP BY 1 ORDER BY name_norm""".stripMargin,
    "etl_regex_extract" ->
      """WITH e AS (
        |  SELECT CAST(nullif(regexp_extract(p_brand, 'Brand#(\d+)', 1), '') AS BIGINT) AS brand_num
        |  FROM part)
        |SELECT CASE WHEN brand_num IS NULL THEN 'none'
        |            WHEN brand_num < 10 THEN 'low' ELSE 'high' END AS bucket,
        |count(*) AS cnt, min(brand_num) AS min_num, max(brand_num) AS max_num
        |FROM e GROUP BY 1 ORDER BY bucket""".stripMargin,
    "etl_rlike_case" ->
      """SELECT CASE WHEN regexp_matches(p_type, '^(ECONOMY|STANDARD)$') THEN 'basic'
        |            WHEN regexp_matches(p_type, 'PROMO') THEN 'promo'
        |            ELSE 'other' END AS kind, count(*) AS cnt
        |FROM part GROUP BY 1 ORDER BY kind""".stripMargin
  )
}
