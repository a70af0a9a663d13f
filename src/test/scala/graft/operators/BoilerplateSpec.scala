package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Boilerplate.removeFrequentLines]]: the CCNet-style line-df scrub.
  * Pins the threshold semantics, survivor ORDER, the all-boilerplate
  * row (kept as '' for loss accounting), and duplicate-lines-in-one-doc
  * counting (df is per-DOC, occurrences all removed).
  */
class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "NAV\nunique one\nFOOTER"),
    (2L, "NAV\nunique two\nFOOTER"),
    (3L, "NAV\nunique three\nFOOTER\nFOOTER"),
    (4L, "NAV\nFOOTER"),
    (5L, "all mine\nalso mine")
  ).toDF("doc_id", "text")

  test("lines at/above minDf are removed everywhere; unique lines survive in order") {
    val out = Boilerplate.removeFrequentLines(docs, minDf = 4)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect()
    // NAV df=4, FOOTER df=4 (per-DOC distinct: doc 3's double FOOTER counts once)
    assert(out(0) == ((1L, 3L, 2L, "unique one")))
    assert(out(1) == ((2L, 3L, 2L, "unique two")))
    // BOTH occurrences of a boilerplate line are removed
    assert(out(2) == ((3L, 4L, 3L, "unique three")))
    // everything-boilerplate doc stays as an '' row (loss accounting)
    assert(out(3) == ((4L, 2L, 2L, "")))
    assert(out(4) == ((5L, 2L, 0L, "all mine\nalso mine")))
  }

  test("df counts documents, not occurrences: a line repeated inside ONE doc is not boilerplate") {
    val d = Seq((1L, "x\nx\nx\nx\nx"), (2L, "y")).toDF("doc_id", "text")
    val out = Boilerplate.removeFrequentLines(d, minDf = 2)
      .orderBy($"doc_id").as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 5L, 0L, "x\nx\nx\nx\nx")))
  }

  test("threshold sensitivity and the minDf=1 guard") {
    val out = Boilerplate.removeFrequentLines(docs, minDf = 5)
      .agg(sum($"n_removed")).head().getLong(0)
    assert(out == 0L, "no line reaches df=5")
    val e = intercept[IllegalArgumentException] {
      Boilerplate.removeFrequentLines(docs, minDf = 1)
    }
    assert(e.getMessage.contains("minDf"), e.getMessage)
  }

  test("null text and empty lines are ignored, order survives mixed removal") {
    val d = Seq((1L, "A\n\nmine\n\nA"), (2L, "A\nother"), (3L, null.asInstanceOf[String]),
        (4L, "\n\n"), (5L, "A\nA"))
      .toDF("doc_id", "text")
    val out = Boilerplate.removeFrequentLines(d, minDf = 2)
      .orderBy($"doc_id").as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 3L, 2L, "mine")))
    assert(out(1) == ((2L, 2L, 1L, "other")))
    // loss-accounting contract (advice r13): docs with NO non-empty
    // lines (null text, whitespace-only) still get a row — n_lines=0,
    // nothing removed, empty cleaned text
    assert(out(2) == ((3L, 0L, 0L, "")))
    assert(out(3) == ((4L, 0L, 0L, "")))
    // …and an all-boilerplate doc reports full loss, not absence
    assert(out(4) == ((5L, 2L, 2L, "")))
    assert(out.length == 5)
  }
}
