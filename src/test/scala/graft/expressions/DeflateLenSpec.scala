package graft.expressions

import graft.SparkTestBase
import graft.functions.TextFunctions.deflateLen
import org.apache.spark.sql.functions._

/** The deflate-length expression: class separation (the property q157
  * leans on), null propagation, determinism across evaluations, and
  * parameter validation.
  */
class DeflateLenSpec extends SparkTestBase {
  import spark.implicits._

  test("repetitive text compresses far below same-length high-entropy text") {
    val rep = "spam " * 200                       // 1000 bytes, ~30 compressed
    val ent = (1 to 32).map(i => s"x$i".hashCode.toHexString).mkString.take(200)
    val rows = Seq((rep, ent)).toDF("rep", "ent")
      .select(deflateLen($"rep").as("dr"), octet_length($"rep").as("nr"),
        deflateLen($"ent").as("de"), octet_length($"ent").as("ne"))
      .as[(Long, Int, Long, Int)].head()
    val (dr, nr, de, ne) = rows
    assert(dr * 5 < nr, s"repetitive: $dr of $nr should compress < 20%")
    assert(de * 5 > ne * 2, s"high-entropy: $de of $ne should stay > 40%")
  }

  test("null propagates, empty is small-positive, results are deterministic") {
    val got = Seq(Some("abc"), None, Some("")).toDF("t")
      .select(deflateLen($"t")).as[Option[Long]].collect()
    assert(got(1).isEmpty, "null in, null out")
    assert(got(2).exists(n => n >= 1 && n <= 16), "empty string still emits a final block")
    val twice = (1 to 2).map(_ => Seq("determinism check " * 9).toDF("t")
      .select(deflateLen($"t")).as[Long].head())
    assert(twice(0) == twice(1))
  }

  test("levels outside [1,9] are rejected at construction") {
    intercept[IllegalArgumentException] {
      deflateLen(lit("x"), level = 0)
    }
    intercept[IllegalArgumentException] {
      deflateLen(lit("x"), level = 10)
    }
  }
}
