package graft.io

import java.io.InputStream
import java.nio.file.Path
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.A1

/** Minimal XLSX source (reference S2, `multi_source_ad_etl.py:102`) built on
  * the JDK only — zip + StAX — since no spreadsheet connector resolves
  * offline (SURVEY §7.5 documented this gap; this closes it).
  *
  * Supports the subset ad-platform exports use: first worksheet, shared and
  * inline strings, numbers, booleans. Cell styles (native Excel dates) are
  * not interpreted — the reference pipelines receive dates as strings and
  * normalize them in cleaners, so the same contract applies here.
  *
  * Parsing is driver-side and eager, matching the reference's read model
  * (one small export file per source per day). Large-file ingestion is the
  * CSV/parquet path, not this.
  */
object Xlsx {

  /** Read the first worksheet as (header, rows); rows are aligned to the
    * header width by cell reference (gaps become null).
    */
  def parse(file: Path): (Seq[String], Seq[Seq[String]]) = {
    val zip = new ZipFile(file.toFile)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(Vector.empty)
      val sheetEntry = firstSheetEntry(zip)
      val cells = parseSheet(zip.getInputStream(sheetEntry), shared)
      require(cells.nonEmpty, s"empty worksheet in $file")
      // keep columns through interior header gaps (decorative/merged spacer
      // cells): trim trailing blanks only, name interior blanks like Polars'
      // __UNNAMED__{i} placeholders
      val rawHeader = cells.head.map(_.orNull)
      val lastNamed = rawHeader.lastIndexWhere(_ != null)
      require(lastNamed >= 0, s"no header row in $file")
      val header = rawHeader.take(lastNamed + 1).zipWithIndex.map {
        case (null, i) => s"__UNNAMED__$i"
        case (h, _)    => h
      }
      val rows = cells.tail.map { r =>
        (0 until header.length).map(i => if (i < r.length) r(i).orNull else null).toSeq
      }
      (header.toSeq, rows.toSeq)
    } finally zip.close()
  }

  /** Full-schema-inference read (the `read_excel(infer_schema_length=None)`
    * analog): every column where all non-null values parse as long / double
    * / ISO date / boolean is cast accordingly; otherwise it stays a string.
    */
  def read(spark: SparkSession, file: Path): DataFrame = {
    val (header, rows) = parse(file)
    val asStrings = Sources.fromRows(spark, header, rows)
    val casts = header.zipWithIndex.map { case (name, i) =>
      val values = rows.flatMap(r => Option(r(i))).filter(_.nonEmpty)
      val dt = inferType(values)
      asStrings(s"`$name`").cast(dt).as(name)
    }
    asStrings.select(casts: _*)
  }

  private val LongRe = "[+-]?\\d{1,18}".r
  private val DoubleRe = "[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?".r
  private val DateRe = "\\d{4}-\\d{2}-\\d{2}".r
  private val BoolRe = "(?i)true|false".r

  /** Calendar-valid, not just regex-shaped — an ANSI strict cast of
    * '2026-02-30' would otherwise crash the whole read at action time.
    */
  private def isValidDate(s: String): Boolean =
    DateRe.matches(s) && scala.util.Try(java.time.LocalDate.parse(s)).isSuccess

  private def inferType(values: Seq[String]): DataType =
    if (values.isEmpty) StringType
    else if (values.forall(LongRe.matches)) LongType
    else if (values.forall(DoubleRe.matches)) DoubleType
    else if (values.forall(isValidDate)) DateType
    else if (values.forall(BoolRe.matches)) BooleanType
    else StringType

  private def firstSheetEntry(zip: ZipFile) =
    Option(zip.getEntry("xl/worksheets/sheet1.xml")).getOrElse {
      // fall back to the lowest-numbered worksheet present (numeric sort —
      // lexicographic would put sheet10 before sheet2)
      import scala.jdk.CollectionConverters._
      zip.entries().asScala.toSeq
        .filter(e => e.getName.matches("xl/worksheets/sheet\\d+\\.xml"))
        .sortBy(e => e.getName.replaceAll("\\D", "").toInt)
        .headOption
        .getOrElse(throw new IllegalArgumentException("no worksheet in xlsx"))
    }

  private def newReader(in: InputStream): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    // archive content is untrusted: no DTDs, no external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(in)
  }

  private def parseSharedStrings(in: InputStream): Vector[String] = {
    val out = Vector.newBuilder[String]
    val r = newReader(in)
    var inSi = false
    var phoneticDepth = 0 // skip <rPh>/<phoneticPr> runs (furigana) — only real text
    val sb = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
          inSi = true; phoneticDepth = 0; sb.clear()
        case XMLStreamConstants.START_ELEMENT if inSi && (r.getLocalName == "rPh" || r.getLocalName == "phoneticPr") =>
          phoneticDepth += 1
        case XMLStreamConstants.END_ELEMENT if inSi && (r.getLocalName == "rPh" || r.getLocalName == "phoneticPr") =>
          phoneticDepth -= 1
        case XMLStreamConstants.START_ELEMENT if inSi && phoneticDepth == 0 && r.getLocalName == "t" =>
          sb.append(r.getElementText)
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
          inSi = false; out += sb.toString
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  /** Rows of cells; each row is a sparse-to-dense vector of Option[String]
    * indexed by the cell reference's column letters.
    */
  private def parseSheet(in: InputStream, shared: Vector[String]): Vector[Vector[Option[String]]] = {
    val rows = Vector.newBuilder[Vector[Option[String]]]
    val r = newReader(in)
    var row = mutable.ArrayBuffer.empty[Option[String]]
    var cellCol = -1
    var cellType = ""
    var value: Option[String] = None
    var inV = false
    var inIsT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = mutable.ArrayBuffer.empty[Option[String]]
            case "c" =>
              cellCol = Option(r.getAttributeValue(null, "r"))
                .map(ref => A1.bijectiveBase26ToInt(ref.takeWhile(_.isLetter)) - 1)
                .getOrElse(row.length)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              value = None
            case "v" => inV = true
            case "t" => inIsT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV || inIsT =>
          value = Some(value.getOrElse("") + r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" => inIsT = false
            case "c" =>
              val resolved = (cellType, value) match {
                case ("s", Some(idx)) => shared.lift(idx.trim.toInt)
                case ("b", Some(v))   => Some(if (v.trim == "1") "true" else "false")
                case (_, v)           => v
              }
              while (row.length <= cellCol) row += None
              row(cellCol) = resolved.filter(_.nonEmpty)
            case "row" => rows += row.toVector
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.result()
  }
}
