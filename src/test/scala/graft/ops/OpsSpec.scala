package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Unit coverage for the SURVEY §2 operator families (one test per
  * semantics note where the reference's behavior is subtle).
  */
class OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("R1 unpivot folds all non-id columns, computed from schema") {
    val df = Seq(("camden", "1", "2"), ("barnet", "3", "4"))
      .toDF("Local authority", "Year 8 females: Number", "Year 8 males: Number")
    val m = Reshape.unpivot(df, Seq("Local authority"))
    assert(m.columns.toSeq == Seq("Local authority", "Category", "Value"))
    assert(m.count() == 4)
    assert(m.where($"Category" === "Year 8 males: Number" && $"Local authority" === "barnet")
      .select("Value").as[String].head() == "4")
  }

  test("R2 pivotAsserted raises on duplicate grain (N3/D4), listing keys") {
    val dup = Seq(("camden", "8", "F", "Number", "1"), ("camden", "8", "F", "Number", "2"))
      .toDF("la", "yg", "g", "Metric", "Value")
    val e = intercept[IllegalStateException] {
      Reshape.pivotAsserted(dup, Seq("la", "yg", "g"), "Metric", Seq("Number"), "Value")
    }
    assert(e.getMessage.contains("camden"))
    val ok = Seq(("camden", "Number", "1"), ("camden", "Number_Vaccinated", "2"))
      .toDF("la", "Metric", "Value")
    val p = Reshape.pivotAsserted(ok, Seq("la"), "Metric", Seq("Number", "Number_Vaccinated"), "Value")
    assert(p.columns.toSeq == Seq("la", "Number", "Number_Vaccinated"))
    // closed value list: absent metric still yields a (null) column
    val onlyN = Reshape.pivotAsserted(
      Seq(("camden", "Number", "1")).toDF("la", "Metric", "Value"),
      Seq("la"), "Metric", Seq("Number", "Number_Vaccinated"), "Value")
    assert(onlyN.columns.toSeq == Seq("la", "Number", "Number_Vaccinated"))
    assert(onlyN.select("Number_Vaccinated").head().isNullAt(0))
  }

  test("N1 ordering: dropna before sentinel replace keeps '*' rows") {
    val df = Seq(("a", "*", "1"), ("b", null, "2"), ("c", "3", "4"))
      .toDF("k", "total", "vacc")
    val dropped = Clean.dropNullRows(df, Seq("total", "vacc"))
    assert(dropped.count() == 2) // born-null 'b' gone, '*' row survives
    val scrubbed = Clean.sentinelsToNull(dropped)
    assert(scrubbed.where($"k" === "a").select("total").head().isNullAt(0))
  }

  test("N2 replace is full-frame: sentinels nulled in key columns too") {
    val df = Seq(("*", "1"), ("[E]", "2"), ("[DS]", "3"), ("ok", "4")).toDF("k", "v")
    val s = Clean.sentinelsToNull(df)
    assert(s.where($"k".isNull).count() == 3)
  }

  test("P1/P2 column drop by name predicate") {
    val df = Seq(("x", "1", "2", "3")).toDF("la", "Y8: % vaccinated", "Y8 2 doses: Number", "Y8: Number")
    val d = Clean.dropColumnsWhere(df, c => c.contains("%") || c.contains("2 doses"))
    assert(d.columns.toSeq == Seq("la", "Y8: Number"))
  }

  test("E2/D1 initcap word semantics on apostrophes") {
    val out = Seq("king's lynn", " camden ").toDF("n")
      .select(Derive.cleanName($"n").as("c")).as[String].collect().toSeq
    assert(out == Seq("King's Lynn", "Camden")) // pandas would give King'S Lynn
  }

  test("D1 compat lane (round 11): pandas str.title to the letter") {
    val out = Seq("king's lynn", " camden ", "st. albans", "a1b c", "")
      .toDF("n")
      .select(Derive.cleanNamePandasTitle($"n").as("c")).as[String].collect().toSeq
    // pandas: >>> "king's lynn".title() -> "King'S Lynn";
    // digits are non-alpha so the letter after '1' capitalizes
    assert(out == Seq("King'S Lynn", "Camden", "St. Albans", "A1B C", ""))
  }

  test("E3 no-match regex yields null, not empty string") {
    val out = Seq("Year 8 females", "no digits here").toDF("h")
      .select(Derive.yearGroupFromHeader($"h").as("y")).collect().toSeq
    assert(out == Seq(Row("8"), Row(null)))
  }

  test("E4/N6 gender defaults Male; E5 metric is case-insensitive") {
    val out = Seq("Year 8 females: Number VACCINATED", "Year 8 persons: Number")
      .toDF("h")
      .select(Derive.genderFromHeader($"h").as("g"), Derive.metricFromHeader($"h").as("m"))
      .collect().toSeq
    assert(out == Seq(Row("Female", "Number_Vaccinated"), Row("Male", "Number")))
  }

  test("E6/E7 driver-side A1 extraction") {
    val a1 = "Coverage statistics, September 2023 to August 2024"
    assert(Derive.academicYearEnd(a1).contains(2024))
    assert(Derive.academicYearText(a1).contains("September 2023 to August 2024"))
    assert(Derive.academicYearEnd("garbage header").isEmpty)
    assert(Derive.academicYearText("garbage header").isEmpty)
  }

  test("pivot ∘ unpivot = identity on clean unique-grain data (SURVEY §5.2 tier 4)") {
    import scala.util.Random
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val las = Seq("camden", "barnet", "enfield").take(1 + rnd.nextInt(3))
      val metrics = Seq("Number", "Number_Vaccinated")
      val wide = las.map(la => (la, rnd.nextInt(100).toString, rnd.nextInt(100).toString))
        .toDF("la", "Number", "Number_Vaccinated")
      val long = Reshape.unpivot(wide, Seq("la"), "Metric", "Value")
      val back = Reshape.pivotAsserted(long, Seq("la"), "Metric", metrics, "Value")
      withClue(s"seed=$seed: ") {
        assert(rowsOf(back.select("la", "Number", "Number_Vaccinated")) ==
          rowsOf(wide.select("la", "Number", "Number_Vaccinated")))
      }
    }
  }

  test("U1 unionByNameAll aligns by label and null-fills missing columns") {
    val a = Seq(("x", "1")).toDF("k", "only_a")
    val b = Seq(("2", "y")).toDF("only_b", "k") // different column ORDER too
    val u = Combine.unionByNameAll(Seq(a, b))
    assert(u.columns.sorted.toSeq == Seq("k", "only_a", "only_b"))
    assert(u.where($"k" === "y").select("only_a").head().isNullAt(0))
    assert(u.where($"k" === "x").select("only_a").as[String].head() == "1")
  }
}
