package graft.streaming

import graft.SparkTestBase
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Trigger.AvailableNow: the scheduled-incremental pattern — each
  * invocation drains everything currently available (in bounded
  * micro-batches, unlike Trigger.Once) and STOPS, the checkpoint
  * carrying progress across invocations. This is how a "nightly batch"
  * runs on the streaming engine and inherits exactly-once file landing:
  * re-running over an unchanged source is a no-op, and a re-run after
  * new files land processes ONLY the new files.
  */
class AvailableNowSpec extends SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("AvailableNow drains the backlog, stops, and resumes incrementally") {
    val events = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val src = java.nio.file.Files.createTempDirectory("graft_an_src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft_an_dst").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_an_chk").toString

    val batch1 = events.where($"event_id" % 2 === 0)
    val batch2 = events.where($"event_id" % 2 === 1)
    batch1.repartition(3).write.mode("append").parquet(src)

    def runOnce(): Unit = {
      val q = spark.readStream.schema(events.schema)
        // several micro-batches per invocation — the property that
        // distinguishes AvailableNow from Trigger.Once on a backlog
        // too large for one batch
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream.format("parquet")
        .option("path", dst).option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination() // AvailableNow terminates by itself
    }

    runOnce()
    assert(spark.read.parquet(dst).count() == batch1.count(),
      "first invocation must land exactly the initial backlog")

    // unchanged source: a re-run is a no-op, nothing double-lands
    runOnce()
    assert(spark.read.parquet(dst).count() == batch1.count(),
      "re-run over an unchanged source must land nothing")

    // new files land; the next invocation processes ONLY those
    batch2.repartition(2).write.mode("append").parquet(src)
    runOnce()
    val landed = spark.read.parquet(dst)
    assert(landed.count() == events.count())
    assert(landed.select($"event_id").distinct().count() == events.count(),
      "every event lands exactly once across the three invocations")
  }
}
