package graft.io

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Input connectors (reference S1–S4, S7 — SURVEY §2.1). */
object Sources {

  /** Enumerate a raw directory and read each tabular file as its OWN
    * DataFrame with full schema inference — files may have heterogeneous
    * schemas, and per-file frames are what source detection operates on
    * (a multi-file `spark.read.csv(dir)` would union the schemas and break
    * detection). Ref `multi_source_ad_etl.py:96-108`. `.xlsx` dispatches to
    * the JDK-only [[Xlsx]] reader (reference S2).
    */
  def readTabularFiles(spark: SparkSession, rawDir: String): Seq[DataFrame] = {
    val dir = Paths.get(rawDir)
    require(Files.isDirectory(dir), s"Not a directory: $rawDir")
    val files = scala.util.Using.resource(Files.list(dir))(
      _.iterator().asScala.toSeq.sortBy(_.getFileName.toString))
    val dfs = files.flatMap { f =>
      f.getFileName.toString.toLowerCase match {
        case n if n.endsWith(".csv")  => Some(readCsv(spark, f))
        case n if n.endsWith(".xlsx") => Some(Xlsx.read(spark, f))
        case _ => None
      }
    }
    if (dfs.isEmpty)
      throw new IllegalArgumentException(
        s"No CSV or XLSX found in directory: $rawDir. File(s) present: " +
          (if (files.isEmpty) "None" else files.map(_.getFileName).mkString(", ")))
    dfs
  }

  /** One CSV file, header row, full-file schema inference — the Spark
    * equivalent of `read_csv(infer_schema_length=None)` (Spark samples every
    * row for inference by default). Dates stay ISO strings unless inferred.
    */
  def readCsv(spark: SparkSession, file: Path): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      // quoted fields may contain newlines (ad names); Polars parses them by
      // default — without this Spark splits them into corrupt rows. Costs
      // file-level splittability, irrelevant for per-file daily exports.
      .option("multiLine", "true")
      // RFC-4180 quote doubling ("" inside quoted fields) — platform CSV
      // exports use it; Spark's default backslash escape mis-parses it
      .option("escape", "\"")
      .csv(file.toString)

  /** Build an all-String, row-oriented DataFrame from an in-memory
    * header + rows payload — the Sheets-ingest shape (reference S4/S7,
    * `google_cloud_client.py:87-89`).
    */
  def fromRows(spark: SparkSession, header: Seq[String], rows: Seq[Seq[String]]): DataFrame = {
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val data = rows.map(r => Row.fromSeq(r)).asJava
    spark.createDataFrame(data, schema)
  }
}
