package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DiffSpec extends SparkTestBase {
  import spark.implicits._

  private val old = Seq(
    (1L, Some("a"), 10L), (2L, Some("b"), 20L),
    (3L, Option.empty[String], 30L), (4L, Some("d"), 40L))
  private val neu = Seq(
    (2L, Some("b"), 20L),              // unchanged
    (3L, Some("c"), 30L),              // changed (null -> value)
    (4L, Some("d"), 41L),              // changed
    (5L, Some("e"), 50L))              // added; key 1 removed

  test("classifies added / removed / changed / unchanged per key") {
    val d = Diff.snapshots(
      old.toDF("k", "s", "v"), neu.toDF("k", "s", "v"), Seq("k"))
    val got = d.select($"k", $"status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "changed", 5L -> "added"))
  }

  test("null keys match null-safely — identical null-keyed rows are unchanged") {
    val a = Seq((Option.empty[java.lang.Long], "x"), (Some(1L: java.lang.Long), "y"))
      .toDF("k", "v")
    val d = Diff.snapshots(a, a, Seq("k"))
    assert(d.select($"status").as[String].collect().toSeq == Seq("unchanged", "unchanged"),
      "a null key must not double-classify as removed+added")
    val b = Seq((Option.empty[java.lang.Long], "CHANGED"), (Some(1L: java.lang.Long), "y"))
      .toDF("k", "v")
    val d2 = Diff.snapshots(a, b, Seq("k"))
    assert(d2.where($"k".isNull).select($"status").head.getString(0) == "changed")
  }

  test("null never collides with a value spelling the sentinel") {
    val a = Seq((1L, Option.empty[String])).toDF("k", "s")
    val b = Seq((1L, Some("~"))).toDF("k", "s")
    val d = Diff.snapshots(a, b, Seq("k"))
    assert(d.select($"status").head.getString(0) == "changed")
  }

  test("value concatenation is unambiguous (length-prefixed)") {
    // ("ab","c") vs ("a","bc") must differ even though concat is equal
    val a = Seq((1L, "ab", "c")).toDF("k", "x", "y")
    val b = Seq((1L, "a", "bc")).toDF("k", "x", "y")
    assert(Diff.snapshots(a, b, Seq("k")).select($"status").head.getString(0) == "changed")
  }

  test("schema drift and missing keys are refused loudly") {
    val a = Seq((1L, "a")).toDF("k", "x")
    val b = Seq((1L, "a")).toDF("k", "y")
    intercept[IllegalArgumentException](Diff.snapshots(a, b, Seq("k")))
    intercept[IllegalArgumentException](Diff.snapshots(a, a, Seq.empty))
    intercept[IllegalArgumentException](Diff.snapshots(a, a, Seq("zz")))
  }

  test("shuffles fingerprints, not payloads: wide columns never reach the join") {
    val a = Seq((1L, "w1", "w2", "w3")).toDF("k", "wide_a", "wide_b", "wide_c")
    val d = Diff.snapshots(a, a, Seq("k"))
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("wide_a") && !plan.contains("wide_b") && !plan.contains("wide_c"),
      s"payload columns must be fingerprinted away below the exchange:\n$plan")
  }
}
