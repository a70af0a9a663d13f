package graft.operators

import graft.SparkTestBase

/** Column profiling: the skinny-stream distinct path and the
  * countDistinct fallback must agree, and the edge cases the
  * reshape introduced (all-null column, non-atomic column types)
  * must keep the aggregate semantics: countDistinct excludes nulls,
  * an all-null column reports 0 distinct with null extremes.
  */
class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("nulls, distincts, and native-typed extremes on atomic columns") {
    val df = Seq(
      (1L, Some("b"), Some(9999.0)),
      (2L, Some("a"), Some(14999.0)), // native max — lexicographic would pick 9999
      (3L, None, Some(9999.0)),
      (4L, Some("a"), None)
    ).toDF("id", "s", "d")
    val got = Profile.summary(df, Seq("id", "s", "d"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("id") == ((0L, 4L, "1", "4")))
    assert(got("s") == ((1L, 2L, "a", "b")))
    assert(got("d") == ((1L, 2L, "9999.0", "14999.0")))
  }

  test("an all-null column reports 0 distinct and null extremes") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val got = Profile.summary(df, Seq("s"))
      .as[(String, Long, Long, String, String)].collect()
    assert(got.toSeq == Seq(("s", 2L, 0L, null, null)))
  }

  test("non-atomic columns fall back to countDistinct and still agree") {
    // arrays: a string render is not injective, so the fallback path
    // must carry the distinct count — including alongside atomic cols
    val df = Seq(
      (1L, Seq("x", "y")),
      (2L, Seq("x", "y")),
      (3L, Seq("z"))
    ).toDF("id", "arr")
    val got = Profile.summary(df, Seq("id", "arr"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got == Map("id" -> 3L, "arr" -> 2L))
  }
}
