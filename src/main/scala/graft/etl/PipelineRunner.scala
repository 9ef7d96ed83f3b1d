package graft.etl

import java.nio.file.Paths

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.io.Sinks
import graft.util.A1

/** The reference's script lifecycle (`scripts/apsl_internal.py:138-192`) as
  * one reusable driver: run the conformance pipeline, derive the
  * date-range filename, export to a BOM CSV and to each configured sheet
  * (clear range → serial-dated upload). Laziness note: the pipeline plan
  * executes once per sink action; `orderBy` keys make collected row order
  * deterministic where the reference relied on eager concat order.
  */
object PipelineRunner {

  final case class SheetTarget(sheetKey: String, sheetName: String)

  final case class ExportResult(csvPath: String, rowCount: Long, uploaded: Seq[SheetTarget])

  def runAndExport(
      spark: SparkSession,
      config: EtlConfig,
      rawDir: String,
      capitalize: Boolean,
      processedDir: String,
      filenamePrefix: String,
      orderBy: Seq[Column],
      svc: Sinks.SheetService,
      sheets: Seq[SheetTarget]): ExportResult = {
    // persist before the first action: the filename agg, CSV write, each
    // sheet collect, and the row count are separate actions — uncached they
    // would re-read and re-clean the raw dir per action, and a file landing
    // mid-run would make filename/CSV/sheet reflect different data
    val merged = new MultiSourceAdEtl(config).run(spark, rawDir, capitalize).persist()
    try {
      val rowCount = merged.count()
      if (rowCount == 0) throw new IllegalStateException(
        s"Pipeline produced 0 rows from $rawDir — refusing to export an empty artifact")
      val fileName = A1.makeDateFilename(filenamePrefix, merged)
      val csvPath = Paths.get(processedDir, fileName).toString
      Sinks.writeCsvWithBom(merged, csvPath, orderBy)
      if (sheets.nonEmpty) {
        // one sorted serial-dated collect, fanned out to every sheet target
        val (header, rows) = Sinks.collectSheetPayload(merged, orderBy)
        sheets.foreach(t => Sinks.uploadPayload(svc, header, rows, t.sheetKey, t.sheetName))
      }
      ExportResult(csvPath, rowCount, sheets)
    } finally merged.unpersist()
  }
}
