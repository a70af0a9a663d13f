package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class SegUpdate(cust: Long, segment: String, ts: Timestamp, seq: Long)

/** Streaming SCD2: versions accumulate across micro-batches; within a
  * batch only the latest update per key lands; no-ops add no versions.
  */
class Scd2SinkSpec extends SparkTestBase {
  import spark.implicits._

  private def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")

  test("history accumulates across micro-batches with in-batch latest-wins") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_scd2s").toString
    val mem = MemoryStream[SegUpdate]
    val q = EventStreams.scd2Sink(mem.toDF(), "cust", Seq("segment"), "ts", "seq",
      s"$root/dim", s"$root/ckpt")
    try {
      // batch 1: two updates for cust 1 — only the later (seq 2) lands
      mem.addData(
        SegUpdate(1L, "gold", t(1), 1), SegUpdate(1L, "silver", t(2), 2),
        SegUpdate(2L, "bronze", t(1), 1))
      q.processAllAvailable()
      val h1 = spark.read.parquet(s"$root/dim")
        .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet
      assert(h1 == Set(
        (1L, "silver", t(2), None),
        (2L, "bronze", t(1), None)))
      // batch 2: change for 1 (closes + reopens), no-op for 2
      mem.addData(SegUpdate(1L, "gold", t(5), 3), SegUpdate(2L, "bronze", t(5), 3))
      q.processAllAvailable()
      val h2 = spark.read.parquet(s"$root/dim")
        .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet
      assert(h2 == Set(
        (1L, "silver", t(2), Some(t(5))),
        (1L, "gold", t(5), None),
        (2L, "bronze", t(1), None)))
    } finally q.stop()
  }
}
