package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Binned range join ≡ the naive BETWEEN join, with exactly-once pair
  * emission across bin boundaries and negative-axis values.
  */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val points = Seq(-11L, -8L, -1L, 0L, 1L, 7L, 8L, 15L, 16L, 100L)
    .zipWithIndex.map { case (x, i) => (i.toLong, x) }
  private val intervals = Seq((100L, -10L, 0L), (101L, 0L, 7L), (102L, 5L, 20L),
    (103L, 90L, 110L), (104L, 30L, 40L), (105L, -20L, 200L))

  private def naive = {
    val p = points.toDF("pid", "x")
    val iv = intervals.toDF("ivid", "lo", "hi")
    p.join(iv, $"x" >= $"lo" && $"x" <= $"hi")
      .select($"pid", $"ivid")
  }

  test("matches naive BETWEEN join for several bin widths") {
    val p = points.toDF("pid", "x").repartition(5)
    val iv = intervals.toDF("ivid", "lo", "hi").repartition(3)
    for (w <- Seq(1L, 3L, 8L, 1000L)) {
      val got = RangeJoin.pointInInterval(p, iv, "x", "lo", "hi", w)
        .select($"pid", $"ivid")
      assertSameRows(got, naive)
    }
  }

  test("each qualifying pair is emitted exactly once (no dedup hidden inside)") {
    val p = Seq((1L, 10L)).toDF("pid", "x")
    val iv = Seq((7L, 0L, 100L)).toDF("ivid", "lo", "hi") // spans many bins
    val n = RangeJoin.pointInInterval(p, iv, "x", "lo", "hi", 3L).count()
    assert(n == 1L)
  }

  test("plans as a shuffle equi-join, not BroadcastNestedLoopJoin") {
    val p = points.toDF("pid", "x")
    val iv = intervals.toDF("ivid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(p, iv, "x", "lo", "hi", 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join in:\n$plan")
  }

  // ---- interval-interval overlap ----

  private val ivA = Seq((0L, -15L, -11L), (1L, -10L, 0L), (2L, 0L, 7L),
    (3L, 5L, 20L), (4L, 30L, 40L), (5L, 90L, 110L), (6L, -20L, 200L), (7L, 50L, 50L))
  private val ivB = Seq((10L, -12L, -12L), (11L, -1L, 6L), (12L, 7L, 7L),
    (13L, 19L, 35L), (14L, 41L, 49L), (15L, 100L, 300L), (16L, 50L, 50L))

  private def naiveOverlap = {
    val a = ivA.toDF("aid", "alo", "ahi")
    val b = ivB.toDF("bid", "blo", "bhi")
    a.join(b, $"alo" <= $"bhi" && $"blo" <= $"ahi").select($"aid", $"bid")
  }

  test("intervalOverlap matches the naive overlap join for several bin widths") {
    val a = ivA.toDF("aid", "alo", "ahi").repartition(4)
    val b = ivB.toDF("bid", "blo", "bhi").repartition(3)
    for (w <- Seq(1L, 3L, 8L, 64L, 1000L)) {
      val got = RangeJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", w)
        .select($"aid", $"bid")
      assertSameRows(got, naiveOverlap)
    }
  }

  test("intervalOverlap emits each overlapping pair exactly once across bins") {
    // both intervals span many bins; their overlap spans several too
    val a = Seq((1L, 0L, 100L)).toDF("aid", "alo", "ahi")
    val b = Seq((2L, 50L, 400L)).toDF("bid", "blo", "bhi")
    assert(RangeJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", 7L).count() == 1L)
    // touching endpoints (closed intervals) still match
    val c = Seq((3L, 100L, 200L)).toDF("bid", "blo", "bhi")
    assert(RangeJoin.intervalOverlap(a, c, "alo", "ahi", "blo", "bhi", 7L).count() == 1L)
  }

  test("intervalOverlap stays an equi hash join") {
    val a = ivA.toDF("aid", "alo", "ahi")
    val b = ivB.toDF("bid", "blo", "bhi")
    val plan = RangeJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"non-equi join in:\n$plan")
  }

  test("caller-free default: auto width equals the explicit result and stays bounded under skew") {
    // mostly short intervals plus a 2% long tail: a bare median would
    // pick ~10 and explode each long interval into ~100k bins; the
    // p99/64 floor keeps the fan-out bounded while typical intervals
    // still land in a handful of bins
    val rnd = new scala.util.Random(11)
    val skewed = (1 to 980).map { i =>
      val lo = rnd.nextInt(100000).toLong
      (i.toLong, lo, lo + 5 + rnd.nextInt(10))
    } ++ (1 to 20).map { i =>
      val lo = rnd.nextInt(100000).toLong
      (1000L + i, lo, lo + 1000000L)
    }
    val w = RangeJoin.autoBinWidth(
      skewed.toDF("id", "lo", "hi").select((col("hi") - col("lo") + 1).as("_len")))
    assert(w >= 1000001L / 64 - 1, s"width $w lets the long tail explode")
    assert(w <= 1000001L, s"width $w piles everything into one candidate set")

    val pts = (0 until 500).map(i => (i.toLong, rnd.nextInt(120000).toLong))
    val auto = RangeJoin.pointInInterval(
      pts.toDF("pid", "x"), skewed.toDF("id", "lo", "hi"), "x", "lo", "hi")
      .select($"pid", $"id").as[(Long, Long)].collect().toSet
    val explicit = RangeJoin.pointInInterval(
      pts.toDF("pid", "x"), skewed.toDF("id", "lo", "hi"), "x", "lo", "hi", 16L)
      .select($"pid", $"id").as[(Long, Long)].collect().toSet
    assert(auto == explicit, "auto width must not change the join result")

    val autoOv = RangeJoin.intervalOverlap(
      skewed.take(100).toDF("id", "lo", "hi"),
      skewed.drop(900).toDF("id2", "lo2", "hi2"), "lo", "hi", "lo2", "hi2")
      .select($"id", $"id2").as[(Long, Long)].collect().toSet
    val explicitOv = RangeJoin.intervalOverlap(
      skewed.take(100).toDF("id", "lo", "hi"),
      skewed.drop(900).toDF("id2", "lo2", "hi2"), "lo", "hi", "lo2", "hi2", 64L)
      .select($"id", $"id2").as[(Long, Long)].collect().toSet
    assert(autoOv == explicitOv, "auto width must not change the overlap result")
  }

  test("auto width on an empty interval side does not divide by zero") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("id", "lo", "hi")
    val pts = Seq((1L, 5L)).toDF("pid", "x")
    assert(RangeJoin.pointInInterval(pts, empty, "x", "lo", "hi").count() == 0)
  }
}
