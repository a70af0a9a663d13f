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
}
