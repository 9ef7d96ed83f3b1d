package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table I/O for co-located joins — the third leg of the shuffle
  * strategy next to `broadcast()` (small dims) and AQE (runtime re-plan):
  * two fact tables bucketed on their join key with the same bucket count
  * join WITHOUT a shuffle on either side, because rows are already
  * hash-routed at write time. At 100 TB this converts the recurring
  * fact-fact join of a daily pipeline from two full shuffles per run into
  * zero — the shuffle is paid once, at ingest.
  *
  * Uses Spark's native parquet bucketing (`bucketBy` + `sortBy`, hive-style
  * layout): readable by any Spark; the bucket metadata lives in the session
  * catalog. `sortBy` on the join key additionally removes the sort from
  * sort-merge joins.
  */
object Bucketed {

  /** Write `df` as an external bucketed parquet table at `path`, registered
    * as `table` in the session catalog. Bucket count should be sized so one
    * bucket ≈ one task's worth of data at the target scale (128–512 MB).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      bucketCols: Seq[String],
      nBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must not be empty")
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    // mode("overwrite").saveAsTable drops and recreates an existing table
    // itself (including bucket-spec changes) — no explicit DROP needed
    val sorted = if (sortCols.isEmpty) bucketCols else sortCols
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog —
    * a plain `spark.read.parquet(path)` would lose it and re-shuffle).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
