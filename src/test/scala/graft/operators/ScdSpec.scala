package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

/** SCD2 merge: change closes + reopens, no-op updates ride through,
  * new keys open, null-safe attr comparison, sequential batches build
  * correct history, point-in-time lookup answers "as of" correctly.
  */
class ScdSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
  private val t0 = ts("2024-01-01"); private val t1 = ts("2024-02-01")
  private val t2 = ts("2024-03-01")

  private def hist0 = Seq(
    (1L, "gold", t0, null.asInstanceOf[Timestamp]),
    (2L, "silver", t0, null.asInstanceOf[Timestamp]),
    (3L, null.asInstanceOf[String], t0, null.asInstanceOf[Timestamp]))
    .toDF("cust", "segment", "valid_from", "valid_to")

  test("change closes and reopens; no-op and untouched ride through; new key opens") {
    val updates = Seq(
      (1L, "platinum", t1), // changed
      (2L, "silver", t1),   // no-op
      (3L, null.asInstanceOf[String], t1), // null == null → no-op (null-safe)
      (9L, "bronze", t1))   // new key
      .toDF("cust", "segment", "ts")
    val out = Scd.merge(hist0, updates, "cust", Seq("segment"))
      .as[(Long, Option[String], Timestamp, Option[Timestamp])].collect().toSet
    assert(out == Set(
      (1L, Some("gold"), t0, Some(t1)),      // closed
      (1L, Some("platinum"), t1, None),      // reopened
      (2L, Some("silver"), t0, None),        // no-op untouched
      (3L, None, t0, None),                  // null-safe no-op
      (9L, Some("bronze"), t1, None)))       // new
  }

  test("sequential batches accumulate history; asOf answers point-in-time") {
    val h1 = Scd.merge(hist0, Seq((1L, "platinum", t1)).toDF("cust", "segment", "ts"),
      "cust", Seq("segment"))
    val h2 = Scd.merge(h1, Seq((1L, "gold", t2)).toDF("cust", "segment", "ts"),
      "cust", Seq("segment"))
    val hist = h2.where($"cust" === 1)
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet
    assert(hist == Set(
      (1L, "gold", t0, Some(t1)),
      (1L, "platinum", t1, Some(t2)),
      (1L, "gold", t2, None)))
    def segAt(s: String) = Scd.asOf(h2.where($"cust" === 1),
        org.apache.spark.sql.functions.lit(ts(s)))
      .select($"segment").as[String].collect().toSeq
    assert(segAt("2024-01-15") == Seq("gold"))
    assert(segAt("2024-02-15") == Seq("platinum"))
    assert(segAt("2024-03-15") == Seq("gold"))
  }

  test("in-batch change chain is sequenced by ts: close + two versions") {
    val batch = Seq((1L, "platinum", t1), (1L, "gold", t2))
      .toDF("cust", "segment", "ts")
    val hist = Scd.merge(hist0, batch, "cust", Seq("segment"))
      .where($"cust" === 1)
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet
    // identical to applying the two updates as sequential batches
    assert(hist == Set(
      (1L, "gold", t0, Some(t1)),
      (1L, "platinum", t1, Some(t2)),
      (1L, "gold", t2, None)))
  }

  test("in-batch no-ops are dropped from the chain; new keys chain too") {
    // 2L: silver → silver (no-op) → gold: one close, one new version
    // 9L: new key with its own two-version chain
    val batch = Seq(
      (2L, "silver", t1), (2L, "gold", t2),
      (9L, "bronze", t1), (9L, "bronze", t1), (9L, "iron", t2))
      .toDF("cust", "segment", "ts")
    // 9L's duplicate (bronze, t1) is a no-op against its chain
    // predecessor — dropped, NOT a tie error (only writes are guarded)
    val out = Scd.merge(hist0, batch, "cust", Seq("segment"))
      .where($"cust".isin(2L, 9L))
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet
    assert(out == Set(
      (2L, "silver", t0, Some(t2)),
      (2L, "gold", t2, None),
      (9L, "bronze", t1, Some(t2)),
      (9L, "iron", t2, None)))
  }

  test("conflicting same-ts changes for one key fail at execution") {
    val bad = Seq((1L, "a", t1), (1L, "b", t1)).toDF("cust", "segment", "ts")
    val merged = Scd.merge(hist0, bad, "cust", Seq("segment")) // lazy: no action yet
    val e = intercept[Exception] { merged.collect() }
    assert(exceptionChain(e).exists(m =>
      Option(m.getMessage).exists(_.contains("conflicting updates"))))
    // the guard must fire regardless of which conflicting value no-ops
    // against the current row (determinism under any arrival order)
    val sneaky = Seq((1L, "gold", t1), (1L, "b", t1)).toDF("cust", "segment", "ts")
    val e2 = intercept[Exception] {
      Scd.merge(hist0, sneaky, "cust", Seq("segment")).collect()
    }
    assert(exceptionChain(e2).exists(m =>
      Option(m.getMessage).exists(_.contains("conflicting updates"))))
    // exact-duplicate rows (replays) are NOT conflicts
    val replay = Seq((1L, "platinum", t1), (1L, "platinum", t1)).toDF("cust", "segment", "ts")
    val ok = Scd.merge(hist0, replay, "cust", Seq("segment"))
      .where($"cust" === 1)
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet
    assert(ok == Set((1L, "gold", t0, Some(t1)), (1L, "platinum", t1, None)))
  }

  test("update ts earlier than the open row's valid_from fails at execution") {
    val bad = Seq((1L, "platinum", ts("2023-06-01"))).toDF("cust", "segment", "ts")
    val merged = Scd.merge(hist0, bad, "cust", Seq("segment"))
    val e = intercept[Exception] { merged.collect() }
    assert(exceptionChain(e).exists(m =>
      Option(m.getMessage).exists(_.contains("inverted validity interval"))))
  }

  private def exceptionChain(e: Throwable): List[Throwable] =
    e :: Option(e.getCause).map(exceptionChain).getOrElse(Nil)
}
