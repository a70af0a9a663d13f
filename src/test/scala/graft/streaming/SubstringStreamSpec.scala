package graft.streaming

import graft.SparkTestBase
import graft.operators.SubstringDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured-Streaming ingest for the substring-dedup gram index: a
  * foreachBatch sink probes each micro-batch against the index-so-far
  * and folds it forward — the standard production wiring for an
  * operator whose state is a TABLE (the same shape as the persisted
  * Load.replaceTable loop in SubstringIngestSpec, here driven by a real
  * streaming query). Every micro-batch's retention report must equal
  * the full batch recompute over everything-seen-so-far restricted to
  * that micro-batch (the q209 invariant under streaming semantics).
  */
class SubstringStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val k = 4

  test("foreachBatch gram-index ingest equals per-batch full recomputes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    // state: the gram index as a plain local table (checkpointed so the
    // next fold doesn't recompute the whole history's lineage)
    var index = SubstringDedup.gramIndex(Seq.empty[(Long, String)]
      .toDF("doc_id", "text"), k).localCheckpoint(true)
    val reports = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Long, String)]]
    val expected = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Long, String)]]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.localCheckpoint(true)
        reports += SubstringDedup.cleanKeepFirstIncremental(index, b, k)
          .select($"doc_id", $"n_tokens", $"removed_tokens", $"kept_md5")
          .as[(Long, Long, Long, String)].collect().toSet
        index = SubstringDedup.updateGramIndex(index, b, k).localCheckpoint(true)
        ()
      }
      .start()
    try {
      val b1 = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
      val b2 = Seq((3L, "a b c d e f g h x y"), (4L, "p q r s t u"))
      val b3 = Seq((5L, "p q r s t u"))
      for (b <- Seq(b1, b2, b3)) {
        mem.addData(b: _*)
        q.processAllAvailable()
        val before = seen.toSeq
        seen ++= b
        val all = (before ++ b).toDF("doc_id", "text")
        val ids = b.map(_._1).toSet
        expected += SubstringDedup.cleanKeepFirst(all, k)
          .where($"doc_id".isin(ids.toSeq: _*))
          .select($"doc_id", $"n_tokens", $"removed_tokens", $"kept_md5")
          .as[(Long, Long, Long, String)].collect().toSet
      }
      assert(reports.size == 3)
      reports.zip(expected).zipWithIndex.foreach { case ((got, exp), i) =>
        assert(got == exp, s"micro-batch ${i + 1}: $got vs $exp")
      }
      // the cross-batch duplicate was caught: doc 5 (dup of batch-2's
      // doc 4) is fully removed
      val d5 = reports(2).find(_._1 == 5L).get
      assert(d5._2 == d5._3 && d5._4 == "d41d8cd98f00b204e9800998ecf8427e")
    } finally q.stop()
  }
}
