package graft.ingest

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable
import org.apache.spark.sql.SparkSession

/** Minimal JDK-only XLSX reader (SURVEY.md §7.3 / §2.1 S2-S3): an xlsx
  * file is a zip of OOXML XML parts, readable with `java.util.zip` +
  * StAX — no POI dependency (none exists in the offline jar set).
  *
  * Scope is exactly the reference's need (`src/main.py:27,30`): one
  * named sheet, string-typed cell grid, header-row offset, cell A1
  * metadata — captured in a SINGLE pass over the sheet part, fixing the
  * reference's double scan (divergence D5). Shared strings, inline
  * strings, and raw numeric cell values are supported; formulas
  * evaluate to their cached `<v>` value; anything richer is out of
  * scope by design. Driver-side by design: workbook sheets are small
  * configuration-shaped inputs; bulk data enters via `spark.read`.
  */
object Xlsx {

  /** Read one sheet into a Workbook (grid semantics identical to
    * `Workbook.fromGrid`: row 0 = sheet row 1, cell A1 = metadata).
    */
  def readWorkbook(
      spark: SparkSession, path: String, sheetName: String,
      headerRow: Int = 2): Workbook =
    Workbook.fromGrid(spark, readGrid(path, sheetName), headerRow)

  /** The reference's glob step (S1): every file with `ext` under `dir`,
    * sorted for deterministic processing order. */
  def glob(dir: String, ext: String = ".xlsx"): Seq[String] = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    files.filter(f => f.isFile && f.getName.toLowerCase.endsWith(ext.toLowerCase))
      .map(_.getPath).sorted.toSeq
  }

  /** Parse the named sheet into a padded string cell grid. */
  def readGrid(path: String, sheetName: String): Seq[Seq[String]] = {
    val zip =
      try new ZipFile(path)
      catch {
        case e: java.io.IOException =>
          throw new IllegalArgumentException(s"$path is not a readable xlsx: ${e.getMessage}", e)
      }
    try {
      val shared = readSharedStrings(zip)
      val sheetPart = resolveSheetPart(zip, sheetName)
      readSheet(zip, sheetPart, shared)
    } finally zip.close()
  }

  private def factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  private def withPart[A](zip: ZipFile, name: String)(f: XMLStreamReader => A): Option[A] =
    Option(zip.getEntry(name)).map { e =>
      val in = zip.getInputStream(e)
      val r = factory.createXMLStreamReader(in)
      try f(r) finally { r.close(); in.close() }
    }

  /** sharedStrings.xml: each <si> is one string — concatenate every <t>
    * inside it (plain or rich-text runs), EXCLUDING phonetic guides
    * (<rPh>/<phoneticPr> furigana would otherwise corrupt the value). */
  private def readSharedStrings(zip: ZipFile): IndexedSeq[String] =
    withPart(zip, "xl/sharedStrings.xml") { r =>
      val out = mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var inSi = false
      var inT = false
      var phoneticDepth = 0
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; cur.clear()
              case "rPh" | "phoneticPr" => phoneticDepth += 1
              case "t" if inSi && phoneticDepth == 0 => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "rPh" | "phoneticPr" => phoneticDepth -= 1
              case "si" => inSi = false; out += cur.toString
              case _ =>
            }
          case _ =>
        }
      }
      out.toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

  /** workbook.xml (sheet name → r:id) + workbook.xml.rels (r:id → part). */
  private def resolveSheetPart(zip: ZipFile, sheetName: String): String = {
    val rid = withPart(zip, "xl/workbook.xml") { r =>
      var found: Option[String] = None
      while (r.hasNext && found.isEmpty) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          val name = attr(r, "name")
          if (name.contains(sheetName))
            found = (0 until r.getAttributeCount)
              .find(i => r.getAttributeLocalName(i) == "id")
              .map(r.getAttributeValue)
        }
      }
      found
    }.flatten.getOrElse(
      throw new IllegalArgumentException(s"sheet '$sheetName' not found in ${zip.getName}"))
    val target = withPart(zip, "xl/_rels/workbook.xml.rels") { r =>
      var found: Option[String] = None
      while (r.hasNext && found.isEmpty) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship")
          if (attr(r, "Id").contains(rid)) found = attr(r, "Target")
      }
      found
    }.flatten.getOrElse(throw new IllegalArgumentException(s"relationship $rid not found"))
    if (target.startsWith("/")) target.drop(1)
    else if (target.startsWith("xl/")) target
    else s"xl/$target"
  }

  /** One pass over the sheet part: cells keyed by reference (e.g. BC12),
    * values resolved per cell type, gaps null-filled.
    */
  private def readSheet(
      zip: ZipFile, part: String, shared: IndexedSeq[String]): Seq[Seq[String]] = {
    case class Cell(row: Int, colIdx: Int, value: String)
    val cells = withPart(zip, part) { r =>
      val out = mutable.ArrayBuffer.empty[Cell]
      // streaming writers may omit the optional r attributes: track the
      // current row index and a per-row column cursor as fallbacks
      var rowIdx = -1
      var colCursor = 0
      var cellCol = 0
      var cellType = ""
      var haveCell = false
      var inV = false
      var inIsT = false
      var phoneticDepth = 0 // inline strings carry <rPh> furigana too
      val text = new StringBuilder
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" =>
                rowIdx = attr(r, "r").map(_.toInt - 1).getOrElse(rowIdx + 1)
                colCursor = 0
              case "c" =>
                cellCol = attr(r, "r") match {
                  case Some(ref) => colIndex(ref.takeWhile(_.isLetter))
                  case None => colCursor
                }
                colCursor = cellCol + 1
                cellType = attr(r, "t").getOrElse("n")
                haveCell = true
                text.clear()
              case "rPh" | "phoneticPr" => phoneticDepth += 1
              case "v" => inV = true
              case "t" if phoneticDepth == 0 => inIsT = true // inlineStr's <is><t>
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inV || inIsT => text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" => inV = false
              case "t" => inIsT = false
              case "rPh" | "phoneticPr" => phoneticDepth -= 1
              case "c" if haveCell && text.nonEmpty && rowIdx >= 0 =>
                val raw = text.toString
                val value = cellType match {
                  case "s" => shared.lift(raw.trim.toInt).orNull
                  case _ => raw
                }
                out += Cell(rowIdx, cellCol, value)
                haveCell = false
              case "c" => haveCell = false
              case _ =>
            }
          case _ =>
        }
      }
      out.toSeq
    }.getOrElse(throw new IllegalArgumentException(s"sheet part $part missing"))

    if (cells.isEmpty) return Seq.empty
    val nRows = cells.map(_.row).max + 1
    val grid = Array.fill(nRows)(mutable.ArrayBuffer.empty[String])
    cells.foreach { c =>
      val row = grid(c.row)
      while (row.size <= c.colIdx) row += null
      row(c.colIdx) = c.value
    }
    grid.map(_.toSeq).toSeq
  }

  /** "A"→0, "Z"→25, "AA"→26, "BC"→54. */
  private def colIndex(letters: String): Int =
    letters.toUpperCase.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1

  private def attr(r: XMLStreamReader, local: String): Option[String] =
    (0 until r.getAttributeCount)
      .find(i => r.getAttributeLocalName(i) == local)
      .map(r.getAttributeValue)
}
