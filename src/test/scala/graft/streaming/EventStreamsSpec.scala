package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import graft.core.Tables
import graft.streaming.EventStreams.{Event, UserCounts}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch↔stream equality for the streaming surface (the Verify harness
  * is batch-only, so streams are proven here): the same transform run
  * over a file stream must converge to the batch answer, and custom
  * state must survive across micro-batches.
  */
class EventStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("tumbling window counts: stream over files == batch") {
    val batchEvents = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val staged = java.nio.file.Files.createTempDirectory("graft_stream").toString
    batchEvents.repartition(4).write.mode("overwrite").parquet(staged)

    val streamed = spark.readStream
      .schema(batchEvents.schema)
      .option("maxFilesPerTrigger", 1) // 4 micro-batches
      .parquet(staged)
    val q = EventStreams.tumblingCounts(streamed)
      .writeStream.format("memory").queryName("tumbling_sink")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("tumbling_sink")
    val want = EventStreams.tumblingCounts(batchEvents)
    // exact-decimal sums in the operator: no rounding needed, stream
    // and batch agree bit-for-bit
    assertSameRows(got, want)
    assert(got.count() > 0)
  }

  test("hopping window counts: stream over files == batch, 4 windows per event") {
    val batchEvents = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val staged = java.nio.file.Files.createTempDirectory("graft_hop").toString
    batchEvents.repartition(4).write.mode("overwrite").parquet(staged)

    val streamed = spark.readStream
      .schema(batchEvents.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
    val q = EventStreams.hoppingCounts(streamed)
      .writeStream.format("memory").queryName("hopping_sink")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("hopping_sink")
    val want = EventStreams.hoppingCounts(batchEvents)
    assertSameRows(got, want)
    // 1h windows every 15min: each event contributes to exactly 4
    assert(got.agg(sum($"n")).head().getLong(0) == 4 * batchEvents.count())
  }

  test("stream-static enrichment join: stream over files == batch") {
    val batchEvents = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val userDim = batchEvents.groupBy($"user_id")
      .agg(min($"ts").as("first_seen")) // deterministic per-user attribute
    val staged = java.nio.file.Files.createTempDirectory("graft_enrich").toString
    batchEvents.repartition(4).write.mode("overwrite").parquet(staged)

    val streamed = spark.readStream
      .schema(batchEvents.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
    val q = EventStreams.enrichedEvents(streamed, userDim)
      .writeStream.format("memory").queryName("enrich_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("enrich_sink")
    val want = EventStreams.enrichedEvents(batchEvents, userDim)
    assertSameRows(got, want)
    assert(got.where($"first_seen".isNull).count() == 0, "every event's user is in the dim")
  }

  test("stream-stream attribution join: micro-batched streams == batch") {
    val events = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val views = events.where($"event_type" === "view")
    val purchases = events.where($"event_type" === "purchase")
    val want = EventStreams.attributionJoin(views, purchases)

    // The staged files are NOT time-ordered, so any realistic watermark
    // would (correctly) drop events arriving "late" relative to an
    // earlier micro-batch. Equality-with-batch needs a watermark wider
    // than the fixture's whole time span; eviction behavior itself is a
    // property of the engine's stream-stream join, not of this
    // transform.
    val staged = java.nio.file.Files.createTempDirectory("graft_ssj").toString
    events.repartition(3).write.mode("overwrite").parquet(staged)
    val streamed = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = EventStreams.attributionJoin(
        streamed.where($"event_type" === "view"),
        streamed.where($"event_type" === "purchase"),
        watermark = "60 days")
      .writeStream.format("memory").queryName("ssj_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("ssj_sink")
    assert(got.count() > 0, "attribution join produced no pairs on fixture data")
    assertSameRows(
      got.withColumn("purchase_value", round($"purchase_value", 6)),
      want.withColumn("purchase_value", round($"purchase_value", 6)))
  }

  test("stream-stream LEFT OUTER attribution: unmatched views emit nulls only after expiry") {
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, ts: String, user: Long, typ: String, v: Double) =
      Event(id, Timestamp.valueOf(ts), user, typ, v)
    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStreams.attributionJoinOuter(
        views.toDF(), purchases.toDF(), horizon = "1 hour", watermark = "10 minutes")
      .writeStream.format("memory").queryName("ssjo_sink")
      .outputMode("append").start()
    try {
      // user 7's view matches; user 8's view has no purchase
      views.addData(
        ev(1, "2024-01-01 10:00:00", 7, "view", 0.0),
        ev(2, "2024-01-01 10:00:00", 8, "view", 0.0))
      purchases.addData(ev(3, "2024-01-01 10:30:00", 7, "purchase", 5.0))
      q.processAllAvailable()
      val early = spark.table("ssjo_sink")
      assert(early.where($"purchase_id" === 3 && $"view_id" === 1).count() == 1)
      // the engine must NOT emit the null row while a matching purchase
      // could still arrive (append mode cannot retract)
      assert(early.where($"purchase_id".isNull).count() == 0)
      // advance the watermark on BOTH inputs a day past view 2's
      // expiry (global watermark = min over inputs)...
      views.addData(ev(10, "2024-01-02 10:00:00", 99, "view", 0.0))
      purchases.addData(ev(11, "2024-01-02 10:00:00", 99, "purchase", 1.0))
      q.processAllAvailable()
      // ...and run one more batch: eviction applies the watermark
      // computed at the END of the previous batch
      views.addData(ev(20, "2024-01-02 12:00:00", 98, "view", 0.0))
      purchases.addData(ev(21, "2024-01-02 12:00:00", 98, "purchase", 1.0))
      q.processAllAvailable()
      val got = spark.table("ssjo_sink")
      assert(got.where($"view_id" === 2 && $"purchase_id".isNull).count() == 1,
        "the unmatched view must emit exactly once, with null purchase columns, after expiry")
      assert(got.where($"view_id" === 2).count() == 1, "and never a second time")
    } finally q.stop()
  }

  test("parquet file sink with checkpoint: stream lands every row exactly once") {
    val events = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val src = java.nio.file.Files.createTempDirectory("graft_fsink_src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft_fsink_dst").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_fsink_chk").toString
    events.repartition(3).write.mode("overwrite").parquet(src)

    val q = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .writeStream.format("parquet")
      .option("path", dst).option("checkpointLocation", chk)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val landed = spark.read.parquet(dst)
    assert(landed.count() == events.count())
    assert(landed.select($"event_id").distinct().count() ==
      events.select($"event_id").distinct().count())
  }

  test("session_window formulation agrees with the window-function sessionizer (q45)") {
    val events = Tables.events(spark, sf)
    val viaSessionWindow = EventStreams.sessionCounts(events, "30 minutes")
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"))
    val viaLag = graft.Registry.byName("q45_events_sessionize").run(spark, sf)
      .select($"user_id", $"n_sessions")
    assertSameRows(viaSessionWindow, viaLag)
  }

  test("mapGroupsWithState: running counters accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.runningUserCounts(mem.toDS())
      .writeStream.format("memory").queryName("state_sink")
      .outputMode("update").start()
    try {
      mem.addData(
        Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0),
        Event(2, Timestamp.valueOf("2024-01-01 10:01:00"), 1L, "purchase", 2.0))
      q.processAllAvailable()
      val after1 = spark.table("state_sink").as[UserCounts].collect()
        .filter(_.user_id == 1L).last
      assert(after1 == UserCounts(1L, 2L, 1L))

      mem.addData(
        Event(3, Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "purchase", 3.0),
        Event(4, Timestamp.valueOf("2024-01-01 10:06:00"), 2L, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("state_sink").as[UserCounts].collect()
      val u1 = rows.filter(_.user_id == 1L).last
      val u2 = rows.filter(_.user_id == 2L).last
      assert(u1 == UserCounts(1L, 3L, 2L), "state must carry the first batch forward")
      assert(u2 == UserCounts(2L, 1L, 0L))
    } finally q.stop()
  }
}
