package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.io.Sinks

/** The full reference script lifecycle end-to-end: pipeline → date-range
  * filename → BOM CSV → sheet clear+upload with serial dates.
  */
class PipelineRunnerSpec extends SparkSpec {

  test("runAndExport: apsl pipeline to CSV + sheet (full script shape)") {
    val processed = Files.createTempDirectory("processed").toString
    val svc = new Sinks.InMemorySheetService
    val result = PipelineRunner.runAndExport(
      spark,
      Configs.apsl,
      Fixtures.materialize("apsl"),
      capitalize = true,
      processedDir = processed,
      filenamePrefix = "apsl_daily",
      orderBy = Seq(col("Source"), col("Day"), col("Campaign name")),
      svc = svc,
      sheets = Seq(PipelineRunner.SheetTarget("key1", "raw_data")))

    assert(result.rowCount == 8)
    // date-range filename from the Day column, en-dash separator
    assert(Paths.get(result.csvPath).getFileName.toString ==
      "apsl_daily_2025-08-01–2025-08-02.csv")
    val bytes = Files.readAllBytes(Paths.get(result.csvPath))
    assert(bytes.take(3).toSeq == Seq(0xEF.toByte, 0xBB.toByte, 0xBF.toByte))
    val lines = new String(bytes, "UTF-8").linesIterator.toSeq
    assert(lines.length == 9) // header + 8 rows

    // sheet got cleared then uploaded with header + serial-dated rows
    assert(svc.cleared.nonEmpty && svc.cleared.head._3 == "A:Q")
    val uploaded = svc.get("key1", "raw_data", "A1:Q9")
    assert(uploaded.length == 9)
    assert(uploaded.head.take(2) == Seq("Day", "Source"))
    // 2025-08-01 → Excel serial 45870
    assert(uploaded.tail.exists(_.head == "45870"))
  }
}
