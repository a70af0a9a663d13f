package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-side forget-list enforcement: erased subjects never land. */
class BlocklistSpec extends SparkTestBase {
  import spark.implicits._

  test("blocklisted keys are dropped from every micro-batch; others pass") {
    implicit val sqlCtx = spark.sqlContext
    val block = Seq(2L, 4L).toDF("k")
    val ms = MemoryStream[(Long, String)]
    val q = EventStreams
      .withoutBlocklisted(ms.toDF().toDF("user_id", "v"), block, "user_id")
      .writeStream.format("memory").queryName("bl_sink").outputMode("append")
      .start()
    try {
      ms.addData((1L, "a"), (2L, "erased"), (3L, "b"))
      q.processAllAvailable()
      ms.addData((4L, "erased2"), (5L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bl_sink").select($"user_id", $"v")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (3L, "b"), (5L, "c")))
  }

  test("multi-column blocklist is refused loudly") {
    val bad = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException](
      EventStreams.withoutBlocklisted(Seq((1L, "x")).toDF("user_id", "v"), bad, "user_id"))
  }
}
