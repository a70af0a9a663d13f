package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import graft.functions.Sketches
import graft.functions.TextFunctions.hash60
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Sketch aggregates under Structured Streaming: the CMS/Bloom buffers
  * are mergeable state, so a windowed streaming aggregation must yield
  * the SAME sketch as the batch formulation over the same rows — the
  * property that lets a 100 TB pipeline maintain per-window frequency/
  * membership sketches incrementally instead of rescanning.
  */
case class SketchEvent(item: String, ts: Timestamp)

class StreamingSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private val events = (0 until 60).map(i => SketchEvent(s"item_${i % 7}", t(i % 30)))

  test("windowed streaming CMS equals the batch sketch on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SketchEvent]
    val agg = (df: org.apache.spark.sql.DataFrame) => df
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "15 minutes").as("w"))
      .agg(Sketches.countMin(hash60(col("item")), depth = 4, widthBits = 8).as("sk"))
      .select(col("w.start").as("ws"), col("sk"))
    val q = agg(mem.toDF())
      .writeStream.format("memory").queryName("cms_sink")
      .outputMode("complete").start()
    try {
      mem.addData(events.take(30): _*)
      q.processAllAvailable()
      mem.addData(events.drop(30): _*)
      q.processAllAvailable()
      val streamed = spark.table("cms_sink")
        .as[(Timestamp, Seq[Long])].collect().toMap
      val batch = agg(events.toDF())
        .as[(Timestamp, Seq[Long])].collect().toMap
      assert(streamed == batch, "streaming sketch state must merge to the batch sketch")
      assert(streamed.nonEmpty && streamed.values.forall(_.sum > 0))
    } finally q.stop()
  }

  test("frequency probes of the streamed sketch match exact batch counts at low load") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SketchEvent]
    val q = mem.toDF()
      .groupBy()
      .agg(Sketches.countMin(hash60(col("item")), depth = 4, widthBits = 8).as("sk"))
      .writeStream.format("memory").queryName("cms_total")
      .outputMode("complete").start()
    try {
      events.grouped(20).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
      val sk = spark.table("cms_total").head().getSeq[Long](0)
      val truth = events.groupBy(_.item).view.mapValues(_.size).toMap
      truth.foreach { case (item, n) =>
        val est = Seq(item).toDF("q")
          .select(Sketches.countMinEstimate(
            typedLit(sk), hash60(col("q")), 4, 8))
          .as[Long].head()
        assert(est == n, s"$item: streamed-sketch estimate $est vs true $n")
      }
    } finally q.stop()
  }
}
