package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming dedup: duplicate event ids within the watermark horizon are
  * emitted exactly once, across micro-batches.
  */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("dropDuplicatesWithinWatermark suppresses cross-batch repeats") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.dedupedEvents(mem.toDS().toDF())
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      mem.addData(
        Event(1, t0, 1L, "click", 1.0),
        Event(1, t0, 1L, "click", 1.0), // same-batch duplicate
        Event(2, Timestamp.valueOf("2024-01-01 10:01:00"), 1L, "view", 1.0))
      q.processAllAvailable()
      mem.addData(
        Event(1, Timestamp.valueOf("2024-01-01 10:02:00"), 1L, "click", 1.0), // cross-batch dup id
        Event(3, Timestamp.valueOf("2024-01-01 10:03:00"), 2L, "view", 2.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_sink").select($"event_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }
}
