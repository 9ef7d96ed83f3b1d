package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Builds real .xlsx archives (zip + OOXML) in the test and reads them back
  * through the engine's source dispatch.
  */
object XlsxTestWriter {

  private def colRef(i: Int): String = graft.util.A1.intToBijectiveBase26(i + 1)

  /** Write a minimal standards-shaped xlsx: shared strings for text cells,
    * inline numbers for numerics.
    */
  def write(file: Path, header: Seq[String], rows: Seq[Seq[Any]]): Path = {
    val strings = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sIdx(s: String): Int = strings.getOrElseUpdate(s, strings.size)

    val serialEpoch = java.time.LocalDate.of(1899, 12, 30)
    def cellXml(rowIdx: Int, c: Int, v: Any): String = {
      val ref = s"${colRef(c)}${rowIdx + 1}"
      v match {
        case null => ""
        case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
        case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
        case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
        case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
        // native Excel date: serial number + builtin date style (xf index 1)
        case d: java.time.LocalDate =>
          val serial = java.time.temporal.ChronoUnit.DAYS.between(serialEpoch, d)
          s"""<c r="$ref" s="1"><v>$serial</v></c>"""
        // native datetime: fractional serial + custom date style (xf index 2)
        case dt: java.time.LocalDateTime =>
          val days = java.time.temporal.ChronoUnit.DAYS.between(serialEpoch, dt.toLocalDate)
          val frac = dt.toLocalTime.toSecondOfDay / 86400.0
          s"""<c r="$ref" s="2"><v>${days + frac}</v></c>"""
        case s: String => s"""<c r="$ref" t="s"><v>${sIdx(s)}</v></c>"""
        case other => s"""<c r="$ref" t="s"><v>${sIdx(other.toString)}</v></c>"""
      }
    }

    val allRows = header +: rows
    val sheetRows = allRows.zipWithIndex.map { case (r, i) =>
      s"""<row r="${i + 1}">${r.zipWithIndex.map { case (v, c) => cellXml(i, c, v) }.mkString}</row>"""
    }.mkString
    val sheetXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$sheetRows</sheetData></worksheet>""".stripMargin
    val sstXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.size}" uniqueCount="${strings.size}">
         |${strings.keys.map(s => s"<si><t>${scala.xml.Utility.escape(s)}</t></si>").mkString}</sst>""".stripMargin
    val workbookXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
    val relsXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/></Types>""".stripMargin
    // xf 0: general; xf 1: builtin date (numFmtId 14 = m/d/yyyy);
    // xf 2: custom datetime format (numFmtId 164)
    val stylesXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\-mm\-dd\ hh:mm:ss"/></numFmts>
        |<cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/><xf numFmtId="164" applyNumberFormat="1"/></cellXfs>
        |</styleSheet>""".stripMargin

    val zos = new ZipOutputStream(Files.newOutputStream(file))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    try {
      put("[Content_Types].xml", contentTypes)
      put("xl/workbook.xml", workbookXml)
      put("xl/_rels/workbook.xml.rels", relsXml)
      put("xl/worksheets/sheet1.xml", sheetXml)
      put("xl/styles.xml", stylesXml)
      put("xl/sharedStrings.xml", sstXml)
    } finally zos.close()
    file
  }
}

class XlsxSpec extends SparkSpec {

  test("reads shared strings, numbers, booleans; infers long/double/date/string") {
    val f = Files.createTempDirectory("xlsx").resolve("t.xlsx")
    XlsxTestWriter.write(f,
      header = Seq("Name", "Count", "Price", "Day", "Active"),
      rows = Seq(
        Seq("alpha", 10, 1.5, "2025-08-01", true),
        Seq("beta", 20, 2.25, "2025-08-02", false),
        Seq("gamma", 30, 3.0, "2025-08-03", true)))
    val df = Xlsx.read(spark, f)
    assert(df.schema == StructType(Seq(
      StructField("Name", StringType), StructField("Count", LongType),
      StructField("Price", DoubleType), StructField("Day", DateType),
      StructField("Active", BooleanType))))
    assert(df.count() == 3)
    val r = df.orderBy("Count").head()
    assert(r.getString(0) == "alpha" && r.getLong(1) == 10L && r.getDouble(2) == 1.5)
    assert(r.getDate(3).toString == "2025-08-01")
  }

  test("regex-shaped but calendar-invalid dates stay strings (no ANSI cast crash)") {
    val f = Files.createTempDirectory("xlsx").resolve("baddate.xlsx")
    XlsxTestWriter.write(f,
      header = Seq("Day"),
      rows = Seq(Seq("2025-08-01"), Seq("2026-02-30")))
    val df = Xlsx.read(spark, f)
    assert(df.schema("Day").dataType == StringType)
    assert(df.count() == 2)
  }

  test("interior header gap keeps right-hand columns (placeholder name, no truncation)") {
    val f = Files.createTempDirectory("xlsx").resolve("gap.xlsx")
    XlsxTestWriter.write(f,
      header = Seq("A", null, "C"),
      rows = Seq(Seq("a1", "b1", "c1")))
    val df = Xlsx.read(spark, f)
    assert(df.columns.toSeq == Seq("A", "__UNNAMED__1", "C"))
    val r = df.head()
    assert(r.getString(0) == "a1" && r.getString(2) == "c1")
  }

  test("sparse rows: missing cells become nulls aligned by cell reference") {
    val f = Files.createTempDirectory("xlsx").resolve("sparse.xlsx")
    // row 2 omits column B entirely (no <c> element)
    XlsxTestWriter.write(f,
      header = Seq("A", "B", "C"),
      rows = Seq(Seq("x", "y", "z"), Seq("only-a", null, "c3")))
    val df = Xlsx.read(spark, f)
    val rows = df.collect()
    assert(rows.length == 2)
    val sparse = rows.find(_.getString(0) == "only-a").get
    assert(sparse.isNullAt(1) && sparse.getString(2) == "c3")
  }

  test("native Excel dates: styled serial cells arrive as DateType / TimestampType") {
    val f = Files.createTempDirectory("xlsx").resolve("native.xlsx")
    XlsxTestWriter.write(f,
      header = Seq("Day", "Stamp", "Serial"),
      rows = Seq(
        Seq(java.time.LocalDate.of(2025, 8, 1),
          java.time.LocalDateTime.of(2025, 8, 1, 12, 30, 45), 45870),
        Seq(java.time.LocalDate.of(2025, 8, 2),
          java.time.LocalDateTime.of(2025, 8, 2, 0, 0, 1), 45871)))
    val df = Xlsx.read(spark, f)
    assert(df.schema("Day").dataType == DateType)
    assert(df.schema("Stamp").dataType == TimestampType)
    // an UNstyled serial number stays numeric — style drives the conversion
    assert(df.schema("Serial").dataType == LongType)
    val r = df.orderBy("Day").head()
    assert(r.getDate(0).toString == "2025-08-01")
    assert(r.getTimestamp(1).toString == "2025-08-01 12:30:45.0")
  }

  test("native-date cell round-trips through the ETL pipeline to DateType") {
    val dir = Files.createTempDirectory("native-raw")
    // TikTok-shaped export where By Day is a NATIVE date cell (what real
    // ad-platform exports ship), not a string
    XlsxTestWriter.write(dir.resolve("tiktok.xlsx"),
      header = Seq("By Day", "Account Name", "Campaign Name", "Ad Group Name", "Ad Name",
        "Cost", "Impressions", "Frequency", "Reach", "Clicks (Destination)",
        "Adds To Cart (Website)", "Checkouts Initiated (Website)", "Purchases (Website)",
        "Purchase Value (Website)"),
      rows = Seq(
        Seq(java.time.LocalDate.of(2025, 8, 1), "acct_t", "camp_t1", "grp_t1", "promo",
          101.0, 9500, 1.25, 7600, 250, 26, 15, 6, 455.0)))
    val engine = new graft.etl.MultiSourceAdEtl(graft.etl.Configs.apsl)
    val out = engine.run(spark, dir.toString, capitalize = true)
    assert(out.schema("Day").dataType == DateType)
    assert(out.select("Day").head().getDate(0).toString == "2025-08-01")
  }

  test("isDateFormatCode: date tokens outside quotes/brackets/escapes only") {
    assert(Xlsx.isDateFormatCode("yyyy-mm-dd"))
    assert(Xlsx.isDateFormatCode("m/d/yy h:mm"))
    assert(Xlsx.isDateFormatCode("[$-409]d-mmm-yy"))
    assert(Xlsx.isDateFormatCode("yyyy\\-mm\\-dd"))
    // time-only, currency, and quoted-literal lookalikes are NOT dates
    assert(!Xlsx.isDateFormatCode("hh:mm:ss"))
    assert(!Xlsx.isDateFormatCode("#,##0.00"))
    assert(!Xlsx.isDateFormatCode("0.00\" dollars\""))
    assert(!Xlsx.isDateFormatCode("[Red]0.0%"))
    // date + time tokens = datetime; date-only = not
    assert(Xlsx.isDateTimeFormatCode("yyyy-mm-dd hh:mm:ss"))
    assert(Xlsx.isDateTimeFormatCode("m/d/yy h:mm"))
    assert(!Xlsx.isDateTimeFormatCode("yyyy-mm-dd"))
    assert(!Xlsx.isDateTimeFormatCode("hh:mm:ss")) // time-only is not a date at all
  }

  test("serialToIso: the STYLE decides date vs datetime rendering") {
    assert(Xlsx.serialToIso("45870", withTime = false) == "2025-08-01")
    // a midnight serial in a datetime style keeps its time — the column must
    // stay uniformly datetime, not degrade to mixed strings
    assert(Xlsx.serialToIso("45870", withTime = true) == "2025-08-01 00:00:00")
    assert(Xlsx.serialToIso("45870.5", withTime = true) == "2025-08-01 12:00:00")
    // a fractional serial in a DATE style truncates to the date (fastexcel)
    assert(Xlsx.serialToIso("45870.5", withTime = false) == "2025-08-01")
    assert(Xlsx.serialToIso("45870.999999", withTime = true) == "2025-08-02 00:00:00")
    // t="d" cells pass through, ISO 'T' normalized to the engine's separator
    assert(Xlsx.serialToIso("2025-08-01", withTime = false) == "2025-08-01")
    assert(Xlsx.serialToIso("2025-08-01T12:30:45", withTime = true) == "2025-08-01 12:30:45")
  }

  test("a midnight row does not degrade a datetime column to StringType") {
    val f = Files.createTempDirectory("xlsx").resolve("midnight.xlsx")
    XlsxTestWriter.write(f,
      header = Seq("Stamp"),
      rows = Seq(
        Seq(java.time.LocalDateTime.of(2025, 8, 1, 13, 0, 0)),
        Seq(java.time.LocalDateTime.of(2025, 8, 2, 0, 0, 0))))
    val df = Xlsx.read(spark, f)
    assert(df.schema("Stamp").dataType == TimestampType)
    assert(df.count() == 2)
  }

  test("a data cell beyond the header width fails loudly instead of dropping data") {
    val f = Files.createTempDirectory("xlsx").resolve("wide.xlsx")
    XlsxTestWriter.write(f,
      header = Seq("A", "B"),
      rows = Seq(Seq("a1", "b1", "ORPHAN")))
    val e = intercept[IllegalArgumentException](Xlsx.parse(f))
    assert(e.getMessage.contains("beyond"))
  }

  test("explicit empty-string cells stay \"\" in string columns, null under typed casts") {
    val f = Files.createTempDirectory("xlsx").resolve("empties.xlsx")
    XlsxTestWriter.write(f,
      header = Seq("Name", "Count"),
      rows = Seq(Seq("", 1), Seq("x", "")))
    val (_, rows) = Xlsx.parse(f)
    assert(rows(0)(0) == "" && rows(1)(1) == "")
    val df = Xlsx.read(spark, f)
    assert(df.schema("Count").dataType == LongType) // "" doesn't block inference
    val byName = df.collect().map(r => Option(r.get(0)).getOrElse("∅") -> r).toMap
    assert(byName("").getLong(1) == 1L) // "" kept as a string value
    assert(byName("x").isNullAt(1))     // "" nulled before the strict cast
  }

  test("ETL pipeline over a mixed CSV + XLSX raw dir (reference S2 dispatch)") {
    val dir = Files.createTempDirectory("mixed-raw")
    // CSV: Meta source
    Files.write(dir.resolve("meta.csv"),
      ("Day,Account Name,Campaign Name,Ad Set Name,Ad Name,Amount Spent (USD),Impressions,Reach,Frequency,Link Clicks,Registrations Completed,Adds To Cart,Checkouts Initiated,Purchases,Purchases Conversion Value\n" +
        "2025-08-01,acct_a,camp_m1,set_m1,ad_m1,120.5,12000,9000,1.33,350,12,40,25,9,901.25").getBytes(StandardCharsets.UTF_8))
    // XLSX: TikTok source (same columns the criteria detect)
    XlsxTestWriter.write(dir.resolve("tiktok.xlsx"),
      header = Seq("By Day", "Account Name", "Campaign Name", "Ad Group Name", "Ad Name",
        "Cost", "Impressions", "Frequency", "Reach", "Clicks (Destination)",
        "Adds To Cart (Website)", "Checkouts Initiated (Website)", "Purchases (Website)",
        "Purchase Value (Website)"),
      rows = Seq(
        Seq("Total of 1 campaigns", null, null, null, null, 101.0, 9500, 1.25, 7600, 250, 26, 15, 6, 455.0),
        Seq("2025-08-01", "acct_t", "camp_t1", "grp_t1", "promo", 101.0, 9500, 1.25, 7600, 250, 26, 15, 6, 455.0)))
    val engine = new graft.etl.MultiSourceAdEtl(graft.etl.Configs.apsl)
    val out = engine.run(spark, dir.toString, capitalize = true)
    val bySource = out.groupBy("Source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource == Map("Meta" -> 1L, "TikTok" -> 1L)) // Total row removed
  }
}
