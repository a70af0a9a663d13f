package graft.demo

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Drive: event-time session closure — an abandoned session closes when
  * OTHER traffic advances the watermark; no successor from that user. */
object EventTimeSessionDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(4)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String, u: Long) = Event(id, Timestamp.valueOf(t), u, "click", 1.0)
    val mem = MemoryStream[Event]
    val q = EventStreams.completedSessionsEventTime(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("demo_et").outputMode("append").start()
    mem.addData(ev(1, "2024-01-01 09:00:00", 42), ev(2, "2024-01-01 09:10:00", 42))
    q.processAllAvailable()
    println("after user 42's burst, closed sessions: " + spark.table("demo_et").count())
    mem.addData(ev(3, "2024-01-01 11:00:00", 99)) // unrelated user advances watermark
    q.processAllAvailable()
    mem.addData(ev(4, "2024-01-01 11:05:00", 99))
    q.processAllAvailable()
    spark.table("demo_et").show(false)
    q.stop(); spark.stop()
  }
}
