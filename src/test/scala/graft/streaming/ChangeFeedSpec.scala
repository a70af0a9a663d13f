package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** CDC-out sink: per-batch change feed beside the latest-per-key table.
  * Drives [[EventStreams.changeFeedBatch]] directly so the replay paths
  * (the at-least-once cases a MemoryStream run cannot force) are
  * exercised deterministically.
  */
class ChangeFeedSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_cdc").toString

  private def feed(dir: String): Map[Long, Map[Long, String]] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Map.empty
    else d.listFiles().filter(_.getName.startsWith("batch=")).map { b =>
      val id = b.getName.stripPrefix("batch=").toLong
      id -> spark.read.parquet(b.toString)
        .select($"k", $"status").as[(Long, String)].collect().toMap
    }.toMap
  }

  test("change feed records exactly what each batch altered") {
    val root = tmp()
    val (table, changes, _) = (s"$root/t", s"$root/c", ())
    def run(id: Long, rows: Seq[(Long, Long, Long, String)]): Unit =
      EventStreams.changeFeedBatch(rows.toDF("k", "ts", "seq", "v"),
        id, "k", "ts", "seq", table, changes)

    run(0, Seq((1L, 10L, 0L, "a"), (2L, 10L, 0L, "b")))
    run(1, Seq((1L, 20L, 0L, "a2"), (3L, 20L, 0L, "c")))
    run(2, Seq((2L, 5L, 0L, "stale"))) // older ts — latest unchanged

    assert(spark.read.parquet(table).select($"k", $"v").as[(Long, String)]
      .collect().toMap == Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    assert(feed(changes) == Map(
      0L -> Map(1L -> "added", 2L -> "added"),
      1L -> Map(1L -> "changed", 3L -> "added"),
      2L -> Map.empty[Long, String]))
    // the feed is APPLYABLE: folding the batches in order (latest write
    // per key wins) reconstructs the table without ever reading it
    val applied = (0L to 2L).flatMap { id =>
      val d = new java.io.File(s"$changes/batch=$id")
      if (d.exists())
        spark.read.parquet(d.toString).select($"k", $"v")
          .as[(Long, String)].collect().map { case (k, v) => (id, k, v) }
      else Seq.empty
    }.groupBy(_._2).map { case (k, rows) => k -> rows.maxBy(_._1)._3 }
    assert(applied == Map(1L -> "a2", 2L -> "b", 3L -> "c"),
      "feed rows must carry the new payload, not just fingerprints")
  }

  test("end-to-end through a stream: per-micro-batch feed and final table") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp()
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String)]
    val q = EventStreams.changeFeedSink(
      ms.toDF().toDF("k", "ts", "seq", "v"),
      "k", "ts", "seq", s"$root/t", s"$root/c", s"$root/chk")
    try {
      ms.addData((1L, 10L, 0L, "a"), (2L, 10L, 0L, "b"))
      q.processAllAvailable()
      ms.addData((1L, 20L, 0L, "a2"))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(s"$root/t").select($"k", $"v").as[(Long, String)]
      .collect().toMap == Map(1L -> "a2", 2L -> "b"))
    assert(feed(s"$root/c") == Map(
      0L -> Map(1L -> "added", 2L -> "added"),
      1L -> Map(1L -> "changed")))
  }

  test("null-keyed rows flow through the feed with their payload") {
    val root = tmp()
    val (table, changes) = (s"$root/t", s"$root/c")
    def run(id: Long, rows: Seq[(Option[Long], Long, Long, String)]): Unit =
      EventStreams.changeFeedBatch(rows.toDF("k", "ts", "seq", "v"),
        id, "k", "ts", "seq", table, changes)
    run(0, Seq((Some(1L), 10L, 0L, "a"), (None, 10L, 0L, "n")))
    run(1, Seq((None, 20L, 0L, "n2")))
    val b1 = spark.read.parquet(s"$changes/batch=1")
      .select($"k".isNull.as("nullk"), $"status", $"v")
      .as[(Boolean, String, String)].collect().toSet
    assert(b1 == Set((true, "changed", "n2")),
      "a null-keyed change must land in the feed with its payload")
    assert(spark.read.parquet(table).count() == 2)
  }

  test("replay after publish appends nothing; replay after log write skips") {
    val root = tmp()
    val (table, changes) = (s"$root/t", s"$root/c")
    def run(id: Long, rows: Seq[(Long, Long, Long, String)]): Unit =
      EventStreams.changeFeedBatch(rows.toDF("k", "ts", "seq", "v"),
        id, "k", "ts", "seq", table, changes)

    run(0, Seq((1L, 10L, 0L, "a")))
    // replay of batch 0 after its publish: diff vs current is empty,
    // and the batch=0 dir already exists — both paths skip
    run(0, Seq((1L, 10L, 0L, "a")))
    assert(feed(changes) == Map(0L -> Map(1L -> "added")))

    // crash-between-log-and-publish shape: pre-write batch=1's log with
    // the content the first attempt produced, then run batch 1 — the
    // existing dir must be kept, not overwritten or duplicated
    run(1, Seq((1L, 20L, 0L, "a2")))
    run(1, Seq((1L, 20L, 0L, "a2")))
    assert(feed(changes) == Map(
      0L -> Map(1L -> "added"), 1L -> Map(1L -> "changed")))
    assert(spark.read.parquet(table).select($"v").as[String].collect().toSeq == Seq("a2"))
  }
}
