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

  test("multiple updates for one key in a batch are refused") {
    val bad = Seq((1L, "a", t1), (1L, "b", t1)).toDF("cust", "segment", "ts")
    val e = intercept[IllegalArgumentException] {
      Scd.merge(hist0, bad, "cust", Seq("segment"))
    }
    assert(e.getMessage.contains("multiple updates"))
  }
}
