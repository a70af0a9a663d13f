package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.TextFunctions.{fingerprint, nfc, nfd, stripAccents}

/** Unicode normalization: composed/decomposed forms converge under NFC,
  * accents strip via NFD + mark removal, and fingerprints agree after
  * canonicalization (the dedup property the op exists for).
  */
class UnicodeNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private val composed = "café"        // é as one codepoint
  private val decomposed = "café"     // e + combining acute

  test("NFC composes; NFD decomposes; both idempotent") {
    val row = Seq((composed, decomposed)).toDF("c", "d")
      .select(
        nfc($"d").as("nfc_d"), nfc($"c").as("nfc_c"),
        nfd($"c").as("nfd_c"), nfc(nfc($"d")).as("nfc2"),
        length($"d").as("len_d"), length(nfc($"d")).as("len_nfc"))
      .head()
    assert(row.getString(0) == composed, "NFC must compose the combining sequence")
    assert(row.getString(1) == composed, "NFC on composed input is identity")
    assert(row.getString(2) == decomposed, "NFD must decompose")
    assert(row.getString(3) == composed, "NFC is idempotent")
    assert(row.getInt(4) == 5 && row.getInt(5) == 4, "composition drops a codepoint")
  }

  test("stripAccents removes combining marks from either form") {
    val got = Seq((composed, decomposed, "Zürich señor"))
      .toDF("c", "d", "mix")
      .select(stripAccents($"c"), stripAccents($"d"), stripAccents($"mix"))
      .head()
    assert(got.getString(0) == "cafe" && got.getString(1) == "cafe")
    assert(got.getString(2) == "Zurich senor")
  }

  test("fingerprints agree after NFC — the dedup property") {
    val fps = Seq(composed, decomposed).toDF("x")
      .select(fingerprint(nfc($"x"))).as[String].collect()
    assert(fps(0) == fps(1), "canonicalized near-identical strings must fingerprint equal")
    val raw = Seq(composed, decomposed).toDF("x")
      .select(fingerprint($"x")).as[String].collect()
    assert(raw(0) != raw(1), "without normalization the forms hash apart (the bug)")
  }

  test("null rides through; invalid form is rejected") {
    val n = Seq(Option.empty[String]).toDF("x").select(nfc($"x")).head()
    assert(n.isNullAt(0))
    intercept[IllegalArgumentException] {
      UnicodeNormalize(
        org.apache.spark.sql.graft.ColumnBridge.expression(lit("x")), "NFX")
    }
  }
}
