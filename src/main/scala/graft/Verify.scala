package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // split tens-of-MB single-file tables across cores (see Bench)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // tz-naive parquet timestamps → TIMESTAMP (UTC session), not NTZ,
      // matching the DuckDB oracle's naive-as-UTC epoch values
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration filter: SPARK_GRAFT_ONLY=a,b,c dumps just those
    // queries (the driver never sets it, so its full-corpus run is
    // unaffected); oracle_sql.json below is filtered the same way so
    // tools/check_oracle.py checks exactly the dumped subset
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def keep(name: String) = only.forall(_.contains(name))
    SparkEntry.queries.filter(q => keep(q._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // a few queries persist() small reused intermediates inside their
      // closure; the write above is their final consumer, so drop the cache
      // here — otherwise caches accumulate for the session and GC-pressure
      // every later query in the full-corpus run
      finally spark.catalog.clearCache()
    }
    // the two layout queries (q_bucketed_join / q_partition_prune) leave
    // catalog tables + tmpdir parquet behind by design (the layout IS the
    // operator; their DataFrames read through it) — their results are
    // materialized above, so tear the artifacts down here; same for the
    // persisted ANN index (s_index_build / s_index_query)
    graft.queries.Relational.layoutCleanup(spark, sfDir)
    graft.io.AnnIndex.cleanup(sfDir)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(e => keep(e._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // full declared-query list so tooling can flag queries whose dump FAILED
    // (a missing output dir must read as a failure, not be skipped)
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      SparkEntry.queries.keys.filter(keep).toSeq.sorted.map(q)
        .mkString("[", ",", "]"))
    spark.stop()
  }
}
