package graft.pipeline

import java.time.LocalDate

import graft.SparkTestBase
import graft.ingest.Workbook

/** End-to-end golden test (SURVEY §5.2 tier 2): two synthesized
  * workbooks exercising every branch — sentinel in a measure, born-null
  * measure (dropped, N1), differing column sets across files (U1),
  * dropped %-and-2-doses columns (P1/P2), dirty LA names (E1/E2), and
  * per-file academic-year metadata (N7). Expected rows hand-computed.
  */
class HpvPipelineSpec extends SparkTestBase {

  private val D = LocalDate.of(2026, 1, 15)
  private val sqlD = java.sql.Date.valueOf(D)
  private val T24 = "September 2023 to August 2024"
  private val T25 = "September 2024 to August 2025"

  private def fileA = Workbook.fromGrid(spark, Seq(
    Seq(s"HPV vaccination coverage for $T24"),
    Seq(""),
    Seq("Local authority", "Year 8 females: Number", "Year 8 females: Number vaccinated",
      "Year 8 females: % vaccinated", "Year 8 males: Number", "Year 8 males: Number vaccinated",
      "Year 8 2 doses: Number"),
    Seq(" camden ", "100", "80", "80.0", "90", "70", "5"),
    Seq("ISLINGTON", "*", "60", "50.0", "50", "40", "3"),
    Seq("enfield", "", "10", "10.0", "30", "20", "2")))

  private def fileB = Workbook.fromGrid(spark, Seq(
    Seq(s"Coverage $T25"),
    Seq(""),
    Seq("Local authority", "Year 9 females: Number", "Year 9 females: Number vaccinated"),
    Seq("camden", "110", "95")))

  private def expected: Set[(String, String, String, Any, Any, Int, String, java.sql.Date)] = {
    def r(b: String, yg: String, g: String, t: Any, v: Any, y: Int, txt: String) =
      (b, yg, g, t, v, y, txt, sqlD)
    Set(
      // base (Enfield female born-null → dropped; Islington female '*' → null total)
      r("Camden", "8", "Female", 100L, 80L, 2024, T24),
      r("Camden", "8", "Male", 90L, 70L, 2024, T24),
      r("Islington", "8", "Female", null, 60L, 2024, T24),
      r("Islington", "8", "Male", 50L, 40L, 2024, T24),
      r("Enfield", "8", "Male", 30L, 20L, 2024, T24),
      r("Camden", "9", "Female", 110L, 95L, 2025, T25),
      // gender rollup (Both)
      r("Camden", "8", "Both", 190L, 150L, 2024, T24),
      r("Islington", "8", "Both", 50L, 100L, 2024, T24),
      r("Enfield", "8", "Both", 30L, 20L, 2024, T24),
      r("Camden", "9", "Both", 110L, 95L, 2025, T25),
      // year rollup (All) over base ∪ Both (N5)
      r("Camden", "All", "Female", 100L, 80L, 2024, T24),
      r("Camden", "All", "Male", 90L, 70L, 2024, T24),
      r("Camden", "All", "Both", 190L, 150L, 2024, T24),
      r("Islington", "All", "Female", null, 60L, 2024, T24), // D2: all-null group → null
      r("Islington", "All", "Male", 50L, 40L, 2024, T24),
      r("Islington", "All", "Both", 50L, 100L, 2024, T24),
      r("Enfield", "All", "Male", 30L, 20L, 2024, T24),
      r("Enfield", "All", "Both", 30L, 20L, 2024, T24),
      r("Camden", "All", "Female", 110L, 95L, 2025, T25),
      r("Camden", "All", "Both", 110L, 95L, 2025, T25))
  }

  test("golden: two workbooks → hand-computed fact table") {
    val out = HpvPipeline.transform(Seq(fileA, fileB), D)
    assert(out.columns.toSeq == HpvPipeline.OutputSchema.fieldNames.toSeq)
    val got = out.collect().map { r =>
      (r.getString(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getLong(4),
        r.getInt(5), r.getString(6), r.getDate(7))
    }.toSet
    assert(got.size == out.count().toInt, "unexpected exact-duplicate rows")
    assert(got == expected,
      s"only-got=${got -- expected}\nonly-expected=${expected -- got}")
  }

  test("single-shuffle combine (grouping sets) ≡ faithful combine") {
    val files = Seq(fileA, fileB).map(HpvPipeline.perFile(_, D))
    assertSameRows(HpvPipeline.combine(files), HpvPipeline.combineSingleShuffle(files))
  }

  test("D3: unmatched A1 still yields (null) metadata columns, no crash") {
    val wb = Workbook.fromGrid(spark, Seq(
      Seq("garbage header"),
      Seq(""),
      Seq("Local authority", "Year 8 females: Number", "Year 8 females: Number vaccinated"),
      Seq("camden", "10", "5")))
    val out = HpvPipeline.transform(Seq(wb), D)
    val row = out.where(out("YEAR_GROUP_NUMBER") === "8").head()
    assert(row.isNullAt(out.columns.indexOf("ACADEMIC_YEAR_END_DATE")))
    assert(row.isNullAt(out.columns.indexOf("ACADEMIC_YEAR_TEXT")))
  }

  test("D6: sentinel in a key column forms a null-key group (SQL semantics)") {
    val wb = Workbook.fromGrid(spark, Seq(
      Seq(s"x $T24"),
      Seq(""),
      Seq("Local authority", "Year 8 females: Number", "Year 8 females: Number vaccinated"),
      Seq("*", "10", "5"),
      Seq("camden", "20", "9")))
    val out = HpvPipeline.transform(Seq(wb), D)
    // the '*' borough becomes a null borough key but still aggregates:
    // base + Both + All·Female + All·Both
    assert(out.where(out("BOROUGH_NAME").isNull).count() == 4)
    val nullRows = out.where(out("BOROUGH_NAME").isNull)
      .select("YEAR_GROUP_NUMBER", "GENDER_NAME").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(nullRows == Set(("8", "Female"), ("8", "Both"), ("All", "Female"), ("All", "Both")))
  }

  test("data past the last header column fails loud (no silent truncation)") {
    val e = intercept[IllegalArgumentException] {
      Workbook.fromGrid(spark, Seq(
        Seq("a1"), Seq(""),
        Seq("Local authority", "Year 8 females: Number"),
        Seq("camden", "10", "stray-extra-value")))
    }
    assert(e.getMessage.contains("stray-extra-value"))
  }

  test("workbook CSV staging round-trip (S2 header offset + S3 A1 capture)") {
    val tmp = java.nio.file.Files.createTempFile("wb", ".csv")
    java.nio.file.Files.writeString(tmp,
      s"""Coverage $T24,,
         |,,
         |Local authority,Year 8 females: Number,Year 8 females: Number vaccinated
         | camden ,100,80
         |""".stripMargin)
    val wb = Workbook.readCsvGrid(spark, tmp.toString)
    assert(wb.a1 == s"Coverage $T24")
    assert(wb.data.columns.toSeq == Seq("Local authority", "Year 8 females: Number", "Year 8 females: Number vaccinated"))
    val out = HpvPipeline.transform(Seq(wb), D)
    assert(out.count() == 4) // base + Both + All·Female + All·Both
    java.nio.file.Files.delete(tmp)
  }

  test("D7: duplicate academic years across workbooks are detected") {
    assert(HpvPipeline.duplicateAcademicYears(Seq(fileA, fileB)).isEmpty)
    assert(HpvPipeline.duplicateAcademicYears(Seq(fileA, fileA, fileB)) ==
      Seq((Some(2024), 2)))
  }
}
