package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** A reference-shaped workbook sheet: the data table (headers taken from
  * a mid-sheet header row, all columns string-typed) plus the raw A1
  * metadata cell (SURVEY.md §2.1 S2/S3).
  *
  * One read captures both — fixing the reference's double scan of every
  * file (`src/main.py:27,30`; divergence D5).
  */
final case class Workbook(a1: String, data: DataFrame)

object Workbook {

  /** Build from an in-memory cell grid (rows of cells, row 0 = sheet row
    * 1). `headerRow` is 0-based (the reference uses header=2, i.e. sheet
    * row 3; data from row 4 — `README.md:51-52`). Empty cells become
    * null. Driver-side by design: workbook sheets are small metadata-ish
    * inputs; bulk data enters the engine through `spark.read`
    * (parquet/csv) instead.
    */
  def fromGrid(spark: SparkSession, grid: Seq[Seq[String]], headerRow: Int = 2): Workbook = {
    require(grid.size > headerRow, s"grid has ${grid.size} rows, header expected at $headerRow")
    val a1 = grid.headOption.flatMap(_.headOption).getOrElse("")
    val header = grid(headerRow).map(c => Option(c).getOrElse("").trim)
    val width = header.size
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val rows = grid.drop(headerRow + 1).zipWithIndex.map { case (r, i) =>
      // fail loud on data past the last header (house style, cf. N3/D4):
      // silently dropping a stray trailing value would corrupt measures
      val extras = r.drop(width).filter(c => c != null && c.nonEmpty)
      require(extras.isEmpty,
        s"data row ${headerRow + 2 + i} has ${extras.size} value(s) beyond the " +
          s"$width-column header: ${extras.take(3).mkString(", ")}")
      val padded = r.padTo(width, null: String)
      Row.fromSeq(padded.map(c => if (c == null || c.isEmpty) null else c))
    }
    Workbook(a1, spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema))
  }

  /** Read a CSV-staged sheet (no quoting/escaping — staging format is
    * plain cells) with the same header-offset semantics. Single pass
    * (D5): the file is read once on the driver; A1 and the data grid
    * both come from that read.
    */
  def readCsvGrid(spark: SparkSession, path: String, headerRow: Int = 2): Workbook = {
    import scala.jdk.CollectionConverters._
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path)).asScala.toSeq
    fromGrid(spark, lines.map(_.split(",", -1).toSeq), headerRow)
  }
}
