package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import graft.streaming.EventStreams.{DayVerdict, Event}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stateful rolling count-anomaly stream: verdicts emit only when a
  * later day closes the day under test, the integer 3σ rule matches
  * the batch (q170) formulation exactly, and state stays bounded to
  * the trailing window.
  */
class StreamingAnomalySpec extends SparkTestBase {
  import spark.implicits._

  // n events on 2024-01-<day> for the given type
  private def day(d: Int, n: Int, tpe: String = "click"): Seq[Event] =
    (1 to n).map(i => Event(d * 1000L + i,
      Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"), i.toLong, tpe, 1.0))

  test("a spike against a flat baseline flags; the baseline itself does not") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.countAnomalies(mem.toDS())
      .writeStream.format("memory").queryName("anom_sink")
      .outputMode("append").start()
    try {
      // six flat days then a 5x spike; day 8 only closes day 7
      mem.addData(Seq(1, 2, 3, 4, 5, 6).flatMap(day(_, 10)): _*)
      q.processAllAvailable()
      mem.addData(day(7, 50): _*)
      q.processAllAvailable()
      mem.addData(day(8, 10): _*)
      q.processAllAvailable()

      val got = spark.table("anom_sink").as[DayVerdict].collect()
        .map(v => v.daynum -> v).toMap
      // days 2-6: flat history, no flag; day 1 has no prior window row
      // (win_n 0 emitted with anomaly=false)
      assert(got.values.count(_.anomaly) == 1)
      val spike = got.values.find(_.anomaly).get
      assert(spike.cnt == 50 && spike.win_n == 6 && spike.win_sum == 60)
      // day 8 not yet closed by a successor → no verdict
      assert(!got.keys.exists(d => got(d).cnt == 10 && got(d).win_sum == 110),
        "day 8 must stay open until a later day arrives")
      assert(got.size == 7, s"exactly days 1-7 closed, got ${got.keys.toSeq.sorted}")
    } finally q.stop()
  }

  test("verdicts match the batch q170 rule on in-order data; types are independent") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.countAnomalies(mem.toDS())
      .writeStream.format("memory").queryName("anom_sink2")
      .outputMode("append").start()
    try {
      val counts = Map(1 -> 8, 2 -> 12, 3 -> 9, 4 -> 11, 5 -> 10, 6 -> 10, 7 -> 13, 8 -> 40)
      mem.addData((1 to 8).flatMap(d => day(d, counts(d))) ++ day(3, 5, "view"): _*)
      mem.addData(day(9, 1) ++ day(9, 1, "view"): _*)
      q.processAllAvailable()

      val got = spark.table("anom_sink2").as[DayVerdict].collect()
      val clicks = got.filter(_.event_type == "click").map(v => v.daynum -> v).toMap
      // recompute the batch rule directly
      // 2024-01-01 is epoch day 19723, so 2024-01-0d = 19722 + d
      val base = counts.map { case (d, c) => (19722L + d) -> c.toLong }
      clicks.foreach { case (dn, v) =>
        val win = ((dn - 6) until dn).flatMap(base.get)
        val (n, s, qq) = (win.size.toLong, win.sum, win.map(c => c * c).sum)
        assert(v.win_n == n && v.win_sum == s)
        val expect = n >= 3 && (n * v.cnt - s) * (n * v.cnt - s) > 9 * (n * qq - s * s)
        assert(v.anomaly == expect, s"day $dn: got ${v.anomaly}, expected $expect")
      }
      assert(clicks.values.count(_.anomaly) == 1, "only the 40-count day flags")
      // the lone view day closed with an empty window and no flag
      val views = got.filter(_.event_type == "view")
      assert(views.length == 1 && views.head.cnt == 5 && !views.head.anomaly)
    } finally q.stop()
  }
}
