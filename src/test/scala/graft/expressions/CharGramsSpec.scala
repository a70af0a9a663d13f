package graft.expressions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[CharGrams]] ≡ the lambda formulation it replaces —
  * `array_distinct(filter(transform(sequence(1, greatest(length(t) -
  * (n-1), 0)), i -> substr(t, i, n)), g -> length(g) = n))` over
  * `t = lower(text)` — on hand corners and seeded adversarial strings
  * mixing ASCII, multibyte BMP (Greek/Cyrillic/CJK) and astral-plane
  * code points.
  */
class CharGramsSpec extends SparkTestBase {
  import spark.implicits._

  private def lambda(t: org.apache.spark.sql.Column, n: Int) = {
    val lo = lower(t)
    array_distinct(filter(
      transform(sequence(lit(1), greatest(length(lo) - (n - 1), lit(0))),
        i => lo.substr(i, lit(n))),
      g => length(g) === n))
  }

  private def kernel(t: org.apache.spark.sql.Column, n: Int) =
    org.apache.spark.sql.graft.ColumnBridge.column(
      CharGrams(org.apache.spark.sql.graft.ColumnBridge.expression(t), n))

  private val corners = Seq(
    "", "a", "ab", "abc", "AbC", "aaaa", "a b", "  ", "a\nb\tc",
    "παιδεία", "Παιδεία mixed ascii", "привет мир", "あいうえお",
    "𝕏a𝕏b", "é café naïve", "ſtraße", "1234 5678", "a", "ab ab ab")

  test("kernel == lambda on corners, n = 1..4") {
    val df = corners.toDF("t")
    for (n <- 1 to 4) {
      val bad = df.select(col("t"), kernel(col("t"), n).as("k"), lambda(col("t"), n).as("l"))
        .where(not(col("k") <=> col("l"))).collect()
      assert(bad.isEmpty, s"n=$n diverged on: ${bad.map(_.getString(0)).mkString(" | ")}")
    }
  }

  test("kernel == lambda on 500 seeded adversarial mixed-script strings") {
    val rnd = new scala.util.Random(20260816L)
    val pools = Array("abcXYZ 123", "αβγΔΣ", "абвГД", "あいう漢字", "𝕏𝕐𝕑", "\t\n ", "éçñ")
    val strs = (1 to 500).map { _ =>
      val sb = new StringBuilder
      for (_ <- 0 until rnd.nextInt(40)) {
        val p = pools(rnd.nextInt(pools.length))
        val cps = p.codePoints().toArray
        val cp = cps(rnd.nextInt(cps.length))
        sb.appendAll(Character.toChars(cp))
      }
      sb.toString
    }
    val df = strs.toDF("t")
    for (n <- Seq(2, 3)) {
      val bad = df.select(col("t"), kernel(col("t"), n).as("k"), lambda(col("t"), n).as("l"))
        .where(not(col("k") <=> col("l"))).collect()
      assert(bad.isEmpty, s"n=$n diverged on: ${bad.take(3).map(_.getString(0)).mkString(" | ")}")
    }
  }

  test("null in, null out; width guard") {
    val df = Seq(Option.empty[String]).toDF("t")
    assert(df.select(kernel(col("t"), 2)).head().isNullAt(0))
    intercept[IllegalArgumentException] { CharGrams(null, 0) }
  }
}
