package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class SegUpdate(cust: Long, segment: String, ts: Timestamp, seq: Long)

/** Streaming SCD2: versions accumulate across micro-batches; a batch
  * carrying a key's whole change chain lands EVERY distinct-ts version
  * (round-5 merge semantics); same-(key, ts) replays resolve by seq;
  * no-ops add no versions.
  */
class Scd2SinkSpec extends SparkTestBase {
  import spark.implicits._

  private def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")

  test("in-batch change chains land as history; replays tie-break by seq") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_scd2s").toString
    val mem = MemoryStream[SegUpdate]
    val q = EventStreams.scd2Sink(mem.toDF(), "cust", Seq("segment"), "ts", "seq",
      s"$root/dim", s"$root/ckpt")
    try {
      // batch 1: cust 1 changes twice at distinct ts — BOTH versions
      // land (gold closed at t2, silver open); a same-(key, ts) replay
      // for cust 2 keeps the higher seq only
      mem.addData(
        SegUpdate(1L, "gold", t(1), 1), SegUpdate(1L, "silver", t(2), 2),
        SegUpdate(2L, "bronze", t(1), 1), SegUpdate(2L, "bronze", t(1), 7))
      q.processAllAvailable()
      val h1 = spark.read.parquet(s"$root/dim")
        .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet
      assert(h1 == Set(
        (1L, "gold", t(1), Some(t(2))),
        (1L, "silver", t(2), None),
        (2L, "bronze", t(1), None)))
      // batch 2: change for 1 (closes + reopens), no-op for 2
      mem.addData(SegUpdate(1L, "gold", t(5), 3), SegUpdate(2L, "bronze", t(5), 3))
      q.processAllAvailable()
      val h2 = spark.read.parquet(s"$root/dim")
        .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet
      assert(h2 == Set(
        (1L, "gold", t(1), Some(t(2))),
        (1L, "silver", t(2), Some(t(5))),
        (1L, "gold", t(5), None),
        (2L, "bronze", t(1), None)))
    } finally q.stop()
  }

  test("replayed batch is a no-op, not an inverted-interval crash") {
    // foreachBatch is at-least-once: publish can succeed and the stream
    // die before the checkpoint commit, so the SAME batch replays
    // against the already-merged table. Simulate with a fresh stream +
    // fresh checkpoint re-delivering identical updates.
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_scd2r").toString
    val batch = Seq(
      SegUpdate(1L, "gold", t(1), 1), SegUpdate(1L, "silver", t(2), 2),
      SegUpdate(2L, "bronze", t(1), 1))
    def runOnce(ckpt: String): Unit = {
      val mem = MemoryStream[SegUpdate]
      val q = EventStreams.scd2Sink(mem.toDF(), "cust", Seq("segment"), "ts", "seq",
        s"$root/dim", s"$root/$ckpt")
      try { mem.addData(batch: _*); q.processAllAvailable() } finally q.stop()
    }
    runOnce("ckpt1")
    val before = spark.read.parquet(s"$root/dim")
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet
    runOnce("ckpt2") // full replay — must not throw, must not change history
    val after = spark.read.parquet(s"$root/dim")
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet
    assert(after == before, "replay must be a no-op")
    assert(before == Set(
      (1L, "gold", t(1), Some(t(2))),
      (1L, "silver", t(2), None),
      (2L, "bronze", t(1), None)))
  }
}
