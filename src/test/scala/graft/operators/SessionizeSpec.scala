package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private val events = Seq(
    // user 1: two sessions (gap 100 between 30 and 200)
    (1L, 10L, 1L), (1L, 30L, 2L), (1L, 200L, 3L), (1L, 250L, 4L),
    // user 2: one session, tie on ts broken by event_id
    (2L, 10L, 6L), (2L, 10L, 5L), (2L, 90L, 7L))

  test("markByGap numbers sessions per key; ties break on the tie column") {
    val got = Sessionize.markByGap(
      events.toDF("u", "t", "eid"), Seq("u"), "t", "eid", gap = 100L)
      .select($"u", $"eid", $"sid").as[(Long, Long, Long)]
      .collect().map { case (u, e, s) => (u, e) -> s }.toMap
    assert(got == Map((1L, 1L) -> 1L, (1L, 2L) -> 1L, (1L, 3L) -> 2L, (1L, 4L) -> 2L,
      (2L, 5L) -> 1L, (2L, 6L) -> 1L, (2L, 7L) -> 1L))
  }

  test("intervals reports per-session min/max") {
    val got = Sessionize.intervals(
      events.toDF("u", "t", "eid"), Seq("u"), "t", "eid", gap = 100L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 10L, 30L), (1L, 2L, 200L, 250L), (2L, 1L, 10L, 90L)))
  }

  test("custom break predicate: interval-typed axis") {
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:20:00"), 2L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 11:30:00"), 3L))
      .toDF("u", "ts", "eid")
    val got = Sessionize.mark(df, Seq("u"), "ts", "eid")(
      (cur, prev) => cur > prev + expr("INTERVAL 30 MINUTES"))
      .select($"eid", $"sid").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("refuses an input that already carries sid") {
    val df = Seq((1L, 1L, 1L)).toDF("u", "t", "sid")
    intercept[IllegalArgumentException](
      Sessionize.markByGap(df, Seq("u"), "t", "sid", 1L))
  }
}
