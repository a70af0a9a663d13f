package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of: latest right at-or-before, per key; null when none") {
    val purchases = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")),
      (101L, 1L, ts("2024-01-01 12:00:00")),
      (102L, 2L, ts("2024-01-01 09:00:00")) // user 2 has no prior click
    ).toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (1L, 1L, ts("2024-01-01 09:30:00")),
      (2L, 1L, ts("2024-01-01 10:00:00")), // same instant as purchase 100 → counts (at-or-before)
      (3L, 1L, ts("2024-01-01 11:59:00")),
      (4L, 2L, ts("2024-01-01 09:30:00")) // after user 2's purchase → must not match
    ).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.backward(purchases, clicks, "user_id", "ts", "ts", "event_id",
        leftCols = Seq("event_id"))
      .select($"event_id", $"asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(100L).contains(2L)) // tie at 10:00 → click included, max id wins
    assert(out(101L).contains(3L))
    assert(out(102L).isEmpty)      // no click at or before
  }

  test("ties among right rows at the same timestamp resolve to max id") {
    val l = Seq((10L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val r = Seq(
      (7L, 1L, ts("2024-01-01 09:00:00")),
      (9L, 1L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.backward(l, r, "user_id", "ts", "ts", "event_id", Seq("event_id"))
      .select($"asof_event_id").as[Long].head()
    assert(out == 9L)
  }

  test("forward as-of: earliest right at-or-after, per key; null when none follows") {
    val clicks = Seq(
      (1L, 1L, ts("2024-01-01 09:30:00")),
      (2L, 1L, ts("2024-01-01 10:00:00")), // same instant as purchase 100 -> counts (at-or-after)
      (3L, 1L, ts("2024-01-01 12:30:00")), // after the last purchase -> null
      (4L, 2L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")),
      (101L, 1L, ts("2024-01-01 12:00:00")),
      (102L, 2L, ts("2024-01-01 08:00:00")) // before user 2's click -> must not match
    ).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.forward(clicks, purchases, "user_id", "ts", "ts", "event_id",
        leftCols = Seq("event_id"))
      .select($"event_id", $"asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(100L))
    assert(out(2L).contains(100L)) // tie at 10:00 -> purchase included
    assert(out(3L).isEmpty)        // nothing follows
    assert(out(4L).isEmpty)        // user 2: only an earlier purchase
  }

  test("forward ties among right rows at the same timestamp resolve to min id") {
    val l = Seq((10L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val r = Seq(
      (9L, 1L, ts("2024-01-01 10:00:00")),
      (7L, 1L, ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.forward(l, r, "user_id", "ts", "ts", "event_id", Seq("event_id"))
      .select($"asof_event_id").as[Long].head()
    assert(out == 7L)
  }

  test("tolerance nulls matches farther than the bound, keeps those within it") {
    import org.apache.spark.sql.functions.expr
    val l = Seq(
      (100L, 1L, ts("2024-01-05 10:00:00")), // nearest click 3 days back → too stale
      (101L, 1L, ts("2024-01-02 11:00:00")), // nearest click 1 hour back → within
      (102L, 1L, ts("2024-01-02 10:00:00"))  // exact-instant click → distance 0
    ).toDF("event_id", "user_id", "ts")
    val r = Seq((1L, 1L, ts("2024-01-02 10:00:00"))).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.backwardWithin(l, r, "user_id", "ts", "ts", "event_id",
        Seq("event_id"), tolerance = expr("INTERVAL 1 DAY"))
      .select($"event_id", $"asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(100L).isEmpty, "3-day-old match must null out at 1-day tolerance")
    assert(out(101L).contains(1L) && out(102L).contains(1L))
    // unbounded backward still matches the stale click (the contrast)
    val unbounded = AsOfJoin.backward(l, r, "user_id", "ts", "ts", "event_id", Seq("event_id"))
      .select($"event_id", $"asof_event_id").as[(Long, Option[Long])].collect().toMap
    assert(unbounded(100L).contains(1L))
    // forward tolerance mirrors
    val fwd = AsOfJoin.forwardWithin(
        Seq((200L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts"),
        r, "user_id", "ts", "ts", "event_id", Seq("event_id"),
        tolerance = expr("INTERVAL 12 HOURS"))
      .select($"asof_event_id").as[Option[Long]].head()
    assert(fwd.isEmpty, "next-day match must null out at 12h forward tolerance")
  }

  test("tolerance measures the distance of the PICKED payload, not a nearer null-id row") {
    import org.apache.spark.sql.functions.expr
    // right side: a null-payload row 1h before the probe and the real
    // payload 4 days before — the picked payload (5) is out of
    // tolerance even though the null row's time is within it
    val l = Seq((100L, 1L, ts("2024-01-05 10:00:00"))).toDF("event_id", "user_id", "ts")
    val r = Seq(
      (Option.empty[Long], 1L, ts("2024-01-05 09:00:00")),
      (Some(5L), 1L, ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.backwardWithin(l, r, "user_id", "ts", "ts", "event_id",
        Seq("event_id"), tolerance = expr("INTERVAL 1 DAY"))
      .select($"asof_event_id").as[Option[Long]].head()
    assert(out.isEmpty,
      "stale payload must null out even with a nearer null-payload right row")
  }

  test("reserved working names in leftCols are refused loudly") {
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "_mt")
    val r = Seq((1L, 5L, 100L)).toDF("k", "t2", "rid")
    val e = intercept[IllegalArgumentException](
      AsOfJoin.backward(l, r, "k", "t", "t2", "rid", leftCols = Seq("_mt")))
    assert(e.getMessage.contains("_mt"))
  }
}
