package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming corpus intake: the quality gate is stateless and identical
  * to batch; fingerprint dedup suppresses re-crawled duplicates across
  * micro-batches; stream output equals the batch formulation on the
  * same rows.
  */
case class IntakeDoc(doc_id: Long, text: String, lang: String, ts: Timestamp)

class CorpusIntakeSpec extends SparkTestBase {
  import spark.implicits._

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private val docs = Seq(
    IntakeDoc(1, "alpha beta gamma delta epsilon zeta", "en", t(0)),
    IntakeDoc(2, "short text", "en", t(1)), // fails the >= 5 token gate
    IntakeDoc(3, "Alpha  beta gamma DELTA epsilon zeta", "en", t(2)), // canonical dup of 1
    IntakeDoc(4, "one two three four five six seven", "en", t(3)),
    IntakeDoc(5, "one two three four five six seven", "en", t(4))) // exact dup of 4

  test("stream equals batch: gate + fingerprint dedup") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[IntakeDoc]
    val q = EventStreams.corpusIntake(mem.toDF())
      .select($"doc_id")
      .writeStream.format("memory").queryName("intake_sink")
      .outputMode("append").start()
    try {
      mem.addData(docs(0), docs(1), docs(2))
      q.processAllAvailable()
      mem.addData(docs(3), docs(4)) // cross-batch exact duplicate
      q.processAllAvailable()
      val streamed = spark.table("intake_sink").as[Long].collect().toSet
      val batch = EventStreams.corpusIntake(docs.toDF())
        .select($"doc_id").as[Long].collect().toSet
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      // doc 2 gated out; docs 3/5 suppressed as duplicates (whitespace/
      // case-normalized fingerprint catches the near-identical recrawl)
      assert(streamed == Set(1L, 4L))
    } finally q.stop()
  }
}
