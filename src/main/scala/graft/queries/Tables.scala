package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver's synthetic parquet corpus (TESTDATA.md).
  * Every query takes `(spark, sfDir)` and reads only the tables it needs —
  * column pruning + filter pushdown then reach the parquet scans.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects — read nanos as long (legacy conf) and convert to a
    * microsecond TimestampType column (truncating, matching how other
    * engines downcast ns → µs).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  type Q = (SparkSession, String) => DataFrame
}
