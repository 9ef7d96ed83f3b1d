package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver's synthetic parquet corpus (TESTDATA.md).
  * Every query takes `(spark, sfDir)` and reads only the tables it needs —
  * column pruning + filter pushdown then reach the parquet scans.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // `__p_*` columns are Hive partition DIRECTORIES of the scaled lake
    // layouts (graft.ScaleUp `hive` mode) — physical layout metadata
    // duplicated from data columns, not logical schema. Dropping them here
    // keeps every corpus query layout-invariant (same plan, same oracle,
    // flat or partitioned); partition-PRUNED scans on `__p_*` are
    // exercised by LayoutSpec's guard and q_partition_prune. The drop is
    // a pure projection: column pruning still reaches the scan.
    val p = df.columns.filter(_.startsWith("__p_"))
    if (p.isEmpty) df else df.drop(p.toIndexedSeq: _*)
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects — the SESSION must be built with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (Verify/Bench/TestSpark all
    * do); this reader asserts that instead of mutating shared conf
    * mid-plan. The ns → µs downcast uses exact integer floor division
    * (`(ts - pmod(ts, 1000)) div 1000`), matching the floor-based downcast
    * other engines use — correct for pre-1970 values too, with no
    * double-precision loss on 18-digit nanosecond values.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "session must set spark.sql.legacy.parquet.nanosAsLong=true at build " +
        "time (events.ts is parquet TIMESTAMP(NANOS))")
    // the other half of the timestamp-semantics contract: tz-naive parquet
    // timestamps (the ScaleUp-written µs datasets) must read as TIMESTAMP
    // in the UTC session, not TIMESTAMP_NTZ — a session built without this
    // would silently diverge from the DuckDB oracle's naive-as-UTC epochs
    require(
      spark.conf.getOption("spark.sql.parquet.inferTimestampNTZ.enabled")
        .contains("false"),
      "session must set spark.sql.parquet.inferTimestampNTZ.enabled=false " +
        "at build time (tz-naive parquet ts must read as TIMESTAMP, not NTZ)")
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      // driver testdata: TIMESTAMP(NANOS) read as long ns → downcast
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000)) div 1000")))
      // scaled-up datasets (graft.ScaleUp) carry µs timestamps already
      case _ => raw
    }
  }

  type Q = (SparkSession, String) => DataFrame

  /** Deterministic 1-in-41 md5 stratum of an id column — the sub-corpus
    * draw that lets the heaviest operators be ORACLE-checked at 100×
    * volume: both engines filter the base table by the same md5-48 draw
    * before the operator, which keeps the single-node DuckDB replay at
    * ~1/41 of the corpus while the engine-only measurement still runs the
    * full input. 41 is prime and coprime to every id-pattern modulus the
    * corpus uses (dup planting %5, media kind %3, ScaleUp's Base
    * = 1.2e10 offsets), so the stratum is a uniform unbiased sample at
    * any SF. The draw is the repo-standard md5-48 (first 12 hex chars of
    * md5 of the DECIMAL id string — `CAST(id AS VARCHAR)` in DuckDB, the
    * identical text both engines render for integers).
    */
  def stratum41(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    stratum(id, 41)

  /** The same draw as a DuckDB SQL predicate over `idCol`. */
  def stratum41Sql(idCol: String): String = stratumSql(idCol, 41)

  /** The md5-48 stratum draw at an ARBITRARY prime modulus — the
    * cross-check device (d_minhash_lsh_s37): if the 1-in-41 twins hid a
    * bias class tied to the modulus choice, an independent prime's draw
    * over the same operator would disagree with its own replay; both
    * primes hash-matching rules that out. 37 shares 41's properties
    * (prime, coprime to the %5/%3 id patterns and ScaleUp's Base).
    */
  def stratum(id: org.apache.spark.sql.Column, p: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    conv(substring(md5(id.cast("string")), 1, 12), 16, 10)
      .cast("bigint") % p === 0
  }

  def stratumSql(idCol: String, p: Int): String =
    s"CAST('0x' || substr(md5(CAST($idCol AS VARCHAR)), 1, 12) AS BIGINT) % $p = 0"
}
