package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.TextFunctions.winnow

/** Winnowing fingerprints: the SWA guarantee (shared substring of
  * length >= k+w-1 shares a fingerprint), density vs full hash set,
  * short-input edges, determinism.
  */
class RollingWinnowSpec extends SparkTestBase {
  import spark.implicits._

  private val k = 5
  private val w = 4

  test("shared >= k+w-1 substring yields a shared fingerprint; disjoint docs share none") {
    val common = "identical plagiarized passage here" // >> k+w-1 chars
    val a = s"prefix text one $common and a suffix"
    val b = s"completely other beginning $common different tail"
    val c = "nothing in common with either document at all zzz"
    val fps = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "t")
      .select($"id", winnow($"t", k, w).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert((fps(1L).toSet intersect fps(2L).toSet).nonEmpty,
      "docs sharing a long substring must share a fingerprint")
    assert((fps(1L).toSet intersect fps(3L).toSet).isEmpty &&
      (fps(2L).toSet intersect fps(3L).toSet).isEmpty,
      "disjoint docs should share nothing on this fixture")
  }

  test("winnowed set is much smaller than the full gram-hash set; sorted distinct") {
    val text = ("spark catalyst tungsten codegen shuffle partition " * 20).trim
    val fp = Seq(text).toDF("t").select(winnow($"t", k, w)).as[Seq[Long]].head()
    val nGrams = text.length - k + 1
    assert(fp.nonEmpty && fp.length < nGrams / 2,
      s"winnowing must densify: ${fp.length} of $nGrams grams selected")
    assert(fp == fp.sorted && fp.distinct.length == fp.length)
  }

  test("short inputs: < k codepoints -> empty; == k -> the one hash") {
    val got = Seq((1L, "abc"), (2L, "abcde")).toDF("id", "t")
      .select($"id", winnow($"t", k, w).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L).isEmpty)
    assert(got(2L).length == 1)
  }

  test("overflowing base/mod combinations are rejected at construction") {
    // (mod-1)*base must leave room for a codepoint — a wrap would
    // silently diverge from the SQL oracle (which errors on overflow)
    intercept[IllegalArgumentException] {
      RollingWinnow(
        org.apache.spark.sql.graft.ColumnBridge.expression(lit("x")),
        5, 4, base = 1L << 40, mod = 1L << 53)
    }
  }

  test("same text always fingerprints identically (partitioning-free)") {
    val docs = (1 to 50).map(i => (i.toLong, s"document body number ${i % 5} repeated content"))
    def fps(parts: Int) = docs.toDF("id", "t").repartition(parts)
      .select($"id", winnow($"t", k, w)).as[(Long, Seq[Long])].collect().toMap
    assert(fps(1) == fps(7))
  }
}
