package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import graft.streaming.EventStreams.{Event, SessionSummary}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** flatMapGroupsWithState sessionizer: sessions are emitted only when a
  * later event closes them; open sessions stay buffered in state across
  * micro-batches.
  */
class SessionEmitSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, t: String, u: Long) =
    Event(id, Timestamp.valueOf(t), u, "click", 1.0)

  test("event-time variant: idle session closes via timeout, no successor needed") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.completedSessionsEventTime(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_et_sink")
      .outputMode("append").start()
    try {
      // user 7's only activity, then nothing from them ever again
      mem.addData(ev(1, "2024-01-01 10:00:00", 7), ev(2, "2024-01-01 10:05:00", 7))
      q.processAllAvailable()
      assert(spark.table("sess_et_sink").count() == 0)

      // a DIFFERENT user's much-later event advances the watermark past
      // user 7's gap deadline...
      mem.addData(ev(3, "2024-01-01 12:00:00", 8))
      q.processAllAvailable()
      // ...and the timeout fires on the following trigger
      mem.addData(ev(4, "2024-01-01 12:01:00", 8))
      q.processAllAvailable()

      val closed = spark.table("sess_et_sink").as[SessionSummary].collect()
      assert(closed.exists(_ == SessionSummary(7,
        Timestamp.valueOf("2024-01-01 10:00:00"),
        Timestamp.valueOf("2024-01-01 10:05:00"), 2)),
        s"user 7's idle session must close by timeout; got ${closed.toSeq}")
    } finally q.stop()
  }

  test("sessions emit on gap closure, spanning micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.completedSessions(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_sink")
      .outputMode("append").start()
    try {
      // batch 1: two events 10 min apart → one OPEN session, nothing emitted
      mem.addData(ev(1, "2024-01-01 10:00:00", 7), ev(2, "2024-01-01 10:10:00", 7))
      q.processAllAvailable()
      assert(spark.table("sess_sink").count() == 0)

      // batch 2: event 2 hours later closes the first session
      mem.addData(ev(3, "2024-01-01 12:30:00", 7))
      q.processAllAvailable()
      val closed = spark.table("sess_sink").as[SessionSummary].collect()
      assert(closed.length == 1)
      assert(closed.head == SessionSummary(7,
        Timestamp.valueOf("2024-01-01 10:00:00"),
        Timestamp.valueOf("2024-01-01 10:10:00"), 2))

      // batch 3: another user interleaved; user 7's second session still open
      mem.addData(ev(4, "2024-01-01 09:00:00", 8), ev(5, "2024-01-01 13:30:00", 7))
      q.processAllAvailable()
      val all = spark.table("sess_sink").as[SessionSummary].collect()
      assert(all.length == 2, s"got ${all.toSeq}") // 12:30 session closed by 13:30? gap is 60min > 30 → closed
      assert(all.map(_.n_events).sorted.toSeq == Seq(1, 2))
    } finally q.stop()
  }
}
