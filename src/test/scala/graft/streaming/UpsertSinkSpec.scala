package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** foreachBatch keyed-upsert sink: later micro-batches overwrite earlier
  * rows per key (latest event-time wins, event_id tiebreak), through the
  * staged atomic table swap.
  */
class UpsertSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, t: String, u: Long, v: Double) =
    Event(id, Timestamp.valueOf(t), u, "state", v)

  test("latest row per key survives across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val table = s"$dir/table"
    val mem = MemoryStream[Event]
    val q = EventStreams.keyedUpsertSink(
      mem.toDF(), keyCol = "user_id", tsCol = "ts", seqCol = "event_id",
      tableDir = table, checkpointDir = s"$dir/ckpt")
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", 7, 1.0), ev(2, "2024-01-01 10:00:00", 8, 2.0))
      q.processAllAvailable()
      val after1 = spark.read.parquet(table).select($"user_id", $"value")
        .as[(Long, Double)].collect().toMap
      assert(after1 == Map(7L -> 1.0, 8L -> 2.0))

      // user 7 updated (later ts); user 9 new; user 8 stale event (older
      // ts than its current row) must NOT win; same-ts duplicate for 9
      // resolves by highest event_id
      mem.addData(
        ev(3, "2024-01-01 11:00:00", 7, 10.0),
        ev(4, "2024-01-01 09:00:00", 8, 99.0),
        ev(5, "2024-01-01 12:00:00", 9, 5.0),
        ev(6, "2024-01-01 12:00:00", 9, 6.0))
      q.processAllAvailable()
      val after2 = spark.read.parquet(table).select($"user_id", $"value")
        .as[(Long, Double)].collect().toMap
      assert(after2 == Map(7L -> 10.0, 8L -> 2.0, 9L -> 6.0))
      assert(spark.read.parquet(table).count() == 3)
    } finally q.stop()
  }

  test("missing table with swap debris (__old) fails the batch instead of resetting state") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val table = s"$dir/table"
    // simulate "previous table left at __old" after a failed swap whose
    // restore also failed: dest missing, backup present
    Seq((1L, 1.0)).toDF("user_id", "value").write.parquet(table + "__old")
    val mem = MemoryStream[Event]
    val q = EventStreams.keyedUpsertSink(
      mem.toDF(), keyCol = "user_id", tsCol = "ts", seqCol = "event_id",
      tableDir = table, checkpointDir = s"$dir/ckpt")
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", 7, 1.0))
      val failed =
        try { q.processAllAvailable(); false }
        catch { case _: Throwable => true }
      assert(failed, "batch should fail on swap debris")
      assert(q.exception.isDefined)
      // the accumulated view was NOT silently reset to this batch's rows
      assert(!new java.io.File(table).exists)
    } finally q.stop()
  }

  test("a batch rewrites only the buckets its keys touch; others stay byte-identical") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val table = s"$dir/table"
    // two keys in provably different buckets of the pinned modulus
    val b = (k: Long) => EventStreams.bucketOfKey(spark, k, 8)
    val (k1, k2) = (7L, (8L to 64L).find(b(_) != b(7L)).get)
    val mem = MemoryStream[Event]
    val q = EventStreams.keyedUpsertSink(
      mem.toDF(), keyCol = "user_id", tsCol = "ts", seqCol = "event_id",
      tableDir = table, checkpointDir = s"$dir/ckpt", buckets = 8)
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", k1, 1.0), ev(2, "2024-01-01 10:00:00", k2, 2.0))
      q.processAllAvailable()
      def files(bucket: Int): Map[String, (Long, Long)] = {
        val d = new java.io.File(s"$table/__kp=$bucket")
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> ((f.length, f.lastModified))).toMap
      }
      val untouchedBefore = files(b(k2))
      assert(untouchedBefore.nonEmpty)
      // batch 2 touches ONLY k1's bucket
      mem.addData(ev(3, "2024-01-01 11:00:00", k1, 10.0))
      q.processAllAvailable()
      assert(files(b(k2)) == untouchedBefore,
        "bucket untouched by the batch must keep byte-identical files")
      assert(spark.read.parquet(table).select($"user_id", $"value")
        .as[(Long, Double)].collect().toMap == Map(k1 -> 10.0, k2 -> 2.0))
    } finally q.stop()
  }

  test("restarting the sink with a different bucket count fails loudly") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val table = s"$dir/table"
    val mem = MemoryStream[Event]
    val q = EventStreams.keyedUpsertSink(
      mem.toDF(), keyCol = "user_id", tsCol = "ts", seqCol = "event_id",
      tableDir = table, checkpointDir = s"$dir/ckpt", buckets = 8)
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", 7, 1.0)); q.processAllAvailable()
    } finally q.stop()
    val mem2 = MemoryStream[Event]
    val q2 = EventStreams.keyedUpsertSink(
      mem2.toDF(), keyCol = "user_id", tsCol = "ts", seqCol = "event_id",
      tableDir = table, checkpointDir = s"$dir/ckpt2", buckets = 16)
    try {
      mem2.addData(ev(2, "2024-01-01 11:00:00", 7, 2.0))
      val failed = try { q2.processAllAvailable(); false } catch { case _: Throwable => true }
      assert(failed, "bucket-count mismatch must fail the batch")
      assert(q2.exception.isDefined)
    } finally q2.stop()
  }

  test("a pre-existing unpinned table fails the batch instead of resetting state") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val table = s"$dir/table"
    // a flat pre-bucketing layout: data at the table path, no pin
    Seq((7L, 1.0)).toDF("user_id", "value").write.parquet(table)
    val before = spark.read.parquet(table).collect().toSeq
    val mem = MemoryStream[Event]
    val q = EventStreams.keyedUpsertSink(
      mem.toDF(), keyCol = "user_id", tsCol = "ts", seqCol = "event_id",
      tableDir = table, checkpointDir = s"$dir/ckpt")
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", 7, 99.0))
      val failed = try { q.processAllAvailable(); false } catch { case _: Throwable => true }
      assert(failed, "unpinned non-empty dest must fail the batch")
      assert(q.exception.isDefined)
      // the foreign table was neither merged into nor clobbered
      assert(spark.read.parquet(table).collect().toSeq == before)
      assert(!new java.io.File(table + "__buckets").exists,
        "the guard must fire before the pin is written")
    } finally q.stop()
  }

  test("a micro-batch waits out a transient lock holder instead of dying") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val table = s"$dir/table"
    // simulate a concurrent forget pass: hold the table's writer lock,
    // release it ~3 s in — the batch must WAIT, not kill the stream
    val lock = java.nio.file.Paths.get(table + "__lock")
    java.nio.file.Files.createDirectories(lock.getParent)
    java.nio.file.Files.write(lock, "forget pass @ test".getBytes("UTF-8"))
    val releaser = new Thread(() => {
      Thread.sleep(3000); java.nio.file.Files.deleteIfExists(lock); ()
    })
    releaser.setDaemon(true); releaser.start()
    val mem = MemoryStream[Event]
    val q = EventStreams.keyedUpsertSink(
      mem.toDF(), keyCol = "user_id", tsCol = "ts", seqCol = "event_id",
      tableDir = table, checkpointDir = s"$dir/ckpt")
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", 7, 1.0))
      q.processAllAvailable()
      assert(q.exception.isEmpty, "the stream must survive a transient lock holder")
      assert(spark.read.parquet(table).select($"user_id", $"value")
        .as[(Long, Double)].collect().toMap == Map(7L -> 1.0))
    } finally { q.stop(); releaser.join() }
  }

  test("readUpsertTable restores the pre-bucketing reader contract") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val table = s"$dir/table"
    val mem = MemoryStream[Event]
    val q = EventStreams.keyedUpsertSink(
      mem.toDF(), keyCol = "user_id", tsCol = "ts", seqCol = "event_id",
      tableDir = table, checkpointDir = s"$dir/ckpt")
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", 7, 1.0), ev(2, "2024-01-01 11:00:00", 7, 2.0))
      q.processAllAvailable()
      val view = EventStreams.readUpsertTable(spark, table)
      // schema is exactly what the stream wrote — the internal bucket
      // column does not leak to readers
      assert(view.columns.toSeq == mem.toDF().columns.toSeq)
      assert(view.select($"user_id", $"value")
        .as[(Long, Double)].collect().toMap == Map(7L -> 2.0))
    } finally q.stop()
    // a directory without the sink's pin is not an upsert store
    val foreign = s"$dir/foreign"
    Seq((1L, 1.0)).toDF("user_id", "value").write.parquet(foreign)
    intercept[IllegalArgumentException] {
      EventStreams.readUpsertTable(spark, foreign)
    }
    // pin present but the table dir never landed (crash between pin
    // rename and first publish): a NAMED state, not an opaque
    // schema-inference error
    val phantom = s"$dir/phantom"
    java.nio.file.Files.write(java.nio.file.Paths.get(phantom + "__buckets"),
      "16".getBytes("UTF-8"))
    val e1 = intercept[IllegalStateException] {
      EventStreams.readUpsertTable(spark, phantom)
    }
    assert(e1.getMessage.contains("before the first publish"))
    // fully-emptied table (a forget pass dropped every bucket dir — a
    // state upsertPublish explicitly supports): also a named state
    val emptied = s"$dir/emptied"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(emptied))
    java.nio.file.Files.write(java.nio.file.Paths.get(emptied + "__buckets"),
      "16".getBytes("UTF-8"))
    val e2 = intercept[IllegalStateException] {
      EventStreams.readUpsertTable(spark, emptied)
    }
    assert(e2.getMessage.contains("fully-emptied"))
  }

  test("a corrupt (empty) bucket pin fails with a diagnosable error") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val table = s"$dir/table"
    val mem = MemoryStream[Event]
    val q = EventStreams.keyedUpsertSink(
      mem.toDF(), keyCol = "user_id", tsCol = "ts", seqCol = "event_id",
      tableDir = table, checkpointDir = s"$dir/ckpt")
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", 7, 1.0)); q.processAllAvailable()
    } finally q.stop()
    // simulate a pre-fix crash artifact: an empty pin file
    java.nio.file.Files.write(
      java.nio.file.Paths.get(table + "__buckets"), Array.empty[Byte])
    val mem2 = MemoryStream[Event]
    val q2 = EventStreams.keyedUpsertSink(
      mem2.toDF(), keyCol = "user_id", tsCol = "ts", seqCol = "event_id",
      tableDir = table, checkpointDir = s"$dir/ckpt2")
    try {
      mem2.addData(ev(2, "2024-01-01 11:00:00", 7, 2.0))
      val failed = try { q2.processAllAvailable(); false } catch { case _: Throwable => true }
      assert(failed, "an unparseable pin must fail the batch")
      val msg = q2.exception.map(_.toString + q2.exception.get.getMessage).getOrElse("")
      assert(msg.contains("unreadable"), s"error should name the corrupt pin, got: $msg")
    } finally q2.stop()
  }
}
