package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

class LevenshteinBandedSpec extends AnyFunSuite {

  private def naive(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def banded(a: String, b: String, k: Int): Int =
    LevenshteinBanded.compute(UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("known distances") {
    assert(banded("kitten", "sitting", 10) == 3)
    assert(banded("", "", 0) == 0)
    assert(banded("abc", "", 5) == 3)
    assert(banded("abc", "abc", 0) == 0)
    assert(banded("abc", "abd", 0) == -1)
    assert(banded("abcdefgh", "x", 3) == -1) // length gap exceeds threshold
  }

  test("matches the full DP whenever the distance is within threshold") {
    val r = new scala.util.Random(7)
    val alpha = "abc "
    for (_ <- 1 to 500) {
      val a = Seq.fill(r.nextInt(31))(alpha(r.nextInt(4))).mkString
      val b = Seq.fill(r.nextInt(29))(alpha(r.nextInt(4))).mkString
      val k = r.nextInt(36)
      val exact = naive(a, b)
      val got = banded(a, b, k)
      if (exact <= k) assert(got == exact, s"a=$a b=$b k=$k")
      else assert(got == -1, s"a=$a b=$b k=$k exact=$exact")
    }
  }

  test("random edits land at or under the edit count") {
    val r = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val base = r.alphanumeric.take(120).mkString
      val nEdits = r.nextInt(8)
      var s = base
      for (_ <- 1 to nEdits) {
        val p = r.nextInt(math.max(1, s.length))
        s = r.nextInt(3) match {
          case 0 if s.nonEmpty => s.substring(0, p) + s.substring(math.min(p + 1, s.length)) // delete
          case 1 => s.substring(0, p) + r.nextPrintableChar() + s.substring(p)               // insert
          case _ if s.nonEmpty => s.substring(0, p) + r.nextPrintableChar() + s.substring(math.min(p + 1, s.length)) // replace
          case _ => s
        }
      }
      val d = banded(base, s, 16)
      assert(d >= 0 && d <= nEdits + 8, s"edits=$nEdits got=$d")
      assert(d == naive(base, s))
    }
  }
}
